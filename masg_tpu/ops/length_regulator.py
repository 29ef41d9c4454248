"""Length regulator: expand phoneme-level features to frame level by duration.

The reference implements this as a per-utterance Python loop with a host sync
per phoneme (`predicted[i].item()`, model/modules.py:167-190) — the single
biggest perf/semantics rewrite for TPU. Here it is a fully vectorized,
static-shape gather:

    ends  = cumsum(durations)                  # (B, L)
    idx_t = searchsorted(ends, t, 'right')     # frame t -> source phoneme
    out   = take(x, idx_t, axis=time)          # (B, T, H)

Frames at/beyond the utterance's total duration are zero-filled, matching the
reference's `pad` (utils/tools.py:363-381). Everything is O(B*T*log L) with no
data-dependent shapes, so XLA fuses it into neighbouring ops.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def regulate_lengths(
    x: jnp.ndarray,
    durations: jnp.ndarray,
    max_mel_len: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand (B, L, H) phoneme features into (B, max_mel_len, H) frames.

    Args:
      x: (B, L, H) phoneme-level features.
      durations: (B, L) integer frame counts per phoneme (>= 0). Padded
        phonemes must carry duration 0.
      max_mel_len: static output length (pad/truncate target). Training passes
        the batch's max mel target length; inference passes the bucketed cap.

    Returns:
      (out, mel_len): out is (B, max_mel_len, H) with zeros past each
      utterance's total duration; mel_len is (B,) int32 total durations,
      clipped to max_mel_len (the reference pads to max_len, silently
      truncating overlong outputs the same way).
    """
    durations = durations.astype(jnp.int32)
    ends = jnp.cumsum(durations, axis=-1)  # (B, L)
    total = ends[:, -1]  # (B,)
    frames = jnp.arange(max_mel_len, dtype=jnp.int32)  # (T,)

    # frame t belongs to the first phoneme whose cumulative end exceeds t
    idx = jax.vmap(lambda e: jnp.searchsorted(e, frames, side="right"))(ends)
    idx = jnp.minimum(idx, x.shape[1] - 1)  # guard frames past the last phoneme

    out = jnp.take_along_axis(x, idx[..., None], axis=1)
    valid = frames[None, :] < total[:, None]  # (B, T)
    out = jnp.where(valid[..., None], out, jnp.zeros((), x.dtype))

    mel_len = jnp.minimum(total, max_mel_len).astype(jnp.int32)
    return out, mel_len


def expand_scalars(values: jnp.ndarray, durations: jnp.ndarray, max_mel_len: int) -> jnp.ndarray:
    """Expand (B, L) per-phoneme scalars to (B, max_mel_len) frames.

    Frame-level mirror of `utils/tools.py:166-170` (used for pitch/energy
    overlay expansion); zero past total duration.
    """
    out, _ = regulate_lengths(values[..., None], durations, max_mel_len)
    return out[..., 0]
