"""Variance adaptor: duration/pitch/energy predictors + length regulation.

Reference: model/modules.py:17-296. TPU re-design: the length regulator is the
vectorized static-shape gather from ops/length_regulator.py (replacing the
per-phoneme host-sync loop, modules.py:167-190); pitch/energy bucketization is
a jnp.searchsorted against precomputed bin edges fused with the embedding
lookup.

Deliberately preserved reference quirk: the energy path receives `p_control`,
not `e_control` (modules.py:123-126,144-148).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.length_regulator import regulate_lengths
from ..ops.masks import pad_mask_from_lengths


def make_bins(vmin: float, vmax: float, n_bins: int, quantization: str) -> np.ndarray:
    """(n_bins - 1,) bucket boundaries (reference modules.py:48-71)."""
    if quantization == "log":
        return np.exp(np.linspace(np.log(vmin), np.log(vmax), n_bins - 1)).astype(np.float32)
    return np.linspace(vmin, vmax, n_bins - 1).astype(np.float32)


class VariancePredictor(nn.Module):
    """Conv(k)->ReLU->LN->Dropout x2 -> Linear -> scalar per position
    (reference modules.py:197-250)."""

    filter_size: int = 256
    kernel_size: int = 3
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, pad_mask: Optional[jnp.ndarray], deterministic: bool = True
    ) -> jnp.ndarray:
        h = nn.Conv(self.filter_size, (self.kernel_size,), padding="SAME", dtype=self.dtype,
                    name="conv1d_1")(x)
        h = nn.relu(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm_1")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(self.filter_size, (self.kernel_size,), padding="SAME", dtype=self.dtype,
                    name="conv1d_2")(h)
        h = nn.relu(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm_2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        out = nn.Dense(1, dtype=self.dtype, name="linear_layer")(h)[..., 0]
        if pad_mask is not None:
            out = jnp.where(pad_mask, jnp.zeros((), out.dtype), out)
        return out


class VarianceAdaptorOutput(NamedTuple):
    x: jnp.ndarray  # (B, T_mel, H) frame-level features
    pitch_prediction: jnp.ndarray
    energy_prediction: jnp.ndarray
    log_duration_prediction: jnp.ndarray
    duration_rounded: jnp.ndarray
    mel_len: jnp.ndarray  # (B,)
    mel_pad_mask: jnp.ndarray  # (B, T_mel)


class VarianceAdaptor(nn.Module):
    """Reference modules.py:17-158 with static-shape length regulation.

    `max_mel_len` is the static frame capacity: the batch's padded mel length
    in training (targets given) or the inference bucket cap.
    """

    pitch_bins: Tuple[float, ...]  # (n_bins - 1,) boundaries
    energy_bins: Tuple[float, ...]
    n_bins: int = 256
    hidden: int = 256
    filter_size: int = 256
    kernel_size: int = 3
    dropout: float = 0.5
    pitch_feature_level: str = "phoneme_level"
    energy_feature_level: str = "phoneme_level"
    dtype: jnp.dtype = jnp.float32

    def _embed(self, name: str, bins, values: jnp.ndarray) -> jnp.ndarray:
        edges = jnp.asarray(bins, dtype=jnp.float32)
        ids = jnp.searchsorted(edges, values.astype(jnp.float32), side="left")
        return nn.Embed(self.n_bins, self.hidden, dtype=self.dtype, name=name)(ids)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, L, H) phoneme-level
        src_pad_mask: jnp.ndarray,  # (B, L)
        max_mel_len: int,
        mel_pad_mask: Optional[jnp.ndarray] = None,
        pitch_target: Optional[jnp.ndarray] = None,
        energy_target: Optional[jnp.ndarray] = None,
        duration_target: Optional[jnp.ndarray] = None,
        p_control: float = 1.0,
        e_control: float = 1.0,
        d_control: float = 1.0,
        deterministic: bool = True,
    ) -> VarianceAdaptorOutput:
        del e_control  # reference quirk: energy uses p_control (modules.py:123-126)

        log_d_pred = VariancePredictor(
            self.filter_size, self.kernel_size, self.dropout, self.dtype,
            name="duration_predictor",
        )(x, src_pad_mask, deterministic)

        def variance_branch(name_pred, name_emb, bins, target, mask, control, h):
            pred = VariancePredictor(
                self.filter_size, self.kernel_size, self.dropout, self.dtype, name=name_pred
            )(h, mask, deterministic)
            if target is not None:
                emb = self._embed(name_emb, bins, target)
            else:
                pred = pred * control
                emb = self._embed(name_emb, bins, pred)
            return pred, emb

        pitch_pred = energy_pred = None
        if self.pitch_feature_level == "phoneme_level":
            pitch_pred, emb = variance_branch(
                "pitch_predictor", "pitch_embedding", self.pitch_bins,
                pitch_target, src_pad_mask, p_control, x,
            )
            x = x + emb
        if self.energy_feature_level == "phoneme_level":
            energy_pred, emb = variance_branch(
                "energy_predictor", "energy_embedding", self.energy_bins,
                energy_target, src_pad_mask, p_control, x,
            )
            x = x + emb

        if duration_target is not None:
            duration_rounded = duration_target
            x, mel_len = regulate_lengths(x, duration_target, max_mel_len)
            if mel_pad_mask is None:
                mel_pad_mask = pad_mask_from_lengths(mel_len, max_mel_len)
        else:
            duration_rounded = jnp.clip(
                jnp.round(jnp.exp(log_d_pred) - 1.0) * d_control, 0, None
            )
            # padded phonemes predict 0 after mask-fill -> exp(0)-1 = 0: safe
            x, mel_len = regulate_lengths(x, duration_rounded, max_mel_len)
            mel_pad_mask = pad_mask_from_lengths(mel_len, max_mel_len)

        assert mel_pad_mask is not None

        if self.pitch_feature_level == "frame_level":
            pitch_pred, emb = variance_branch(
                "pitch_predictor", "pitch_embedding", self.pitch_bins,
                pitch_target, mel_pad_mask, p_control, x,
            )
            x = x + emb
        if self.energy_feature_level == "frame_level":
            energy_pred, emb = variance_branch(
                "energy_predictor", "energy_embedding", self.energy_bins,
                energy_target, mel_pad_mask, p_control, x,
            )
            x = x + emb

        return VarianceAdaptorOutput(
            x=x,
            pitch_prediction=pitch_pred,
            energy_prediction=energy_pred,
            log_duration_prediction=log_d_pred,
            duration_rounded=duration_rounded,
            mel_len=mel_len,
            mel_pad_mask=mel_pad_mask,
        )
