"""FFT encoder / decoder stacks.

Reference: transformer/Models.py:33-183. Differences by design (TPU-first):

- positional encodings are computed from the closed form at the (static)
  padded length, which unifies the reference's two branches (table lookup for
  T <= max_seq_len vs on-the-fly extrapolation beyond it, Models.py:86-103) —
  the values are bit-identical to the reference's table;
- the training-time decoder truncation to max_seq_len (Models.py:166-174) is a
  static python-level slice since padded shapes are static under jit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.positional import sinusoid_table
from ..text import N_ACCENT, N_SRC_VOCAB
from .layers import FFTBlock, PaddedEmbed


class Encoder(nn.Module):
    """Phoneme + accent embedding + sinusoid PE + N FFT blocks
    (reference Models.py:33-112)."""

    hidden: int = 256
    n_layers: int = 4
    n_head: int = 2
    d_inner: int = 1024
    kernel_size: Tuple[int, int] = (9, 1)
    dropout: float = 0.2
    max_seq_len: int = 1000
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        src_seq: jnp.ndarray,  # (B, L) int phone ids
        pad_mask: jnp.ndarray,  # (B, L) True at pads
        accents: Optional[jnp.ndarray] = None,  # (B, L) int accent ids
        lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b, max_len = src_seq.shape

        x = PaddedEmbed(N_SRC_VOCAB, self.hidden, dtype=self.dtype, name="src_word_emb")(src_seq)
        if accents is not None:
            # accent id 0 shares the PAD row and therefore contributes zeros —
            # a reference quirk (src_accent_emb padding_idx=PAD, Models.py:60-62)
            x = x + PaddedEmbed(N_ACCENT, self.hidden, dtype=self.dtype, name="src_accent_emb")(
                accents
            )
        x = x + sinusoid_table(max_len, self.hidden, dtype=self.dtype)[None, :, :]

        for i in range(self.n_layers):
            x = FFTBlock(
                self.hidden,
                self.n_head,
                self.d_inner,
                self.kernel_size,
                self.dropout,
                use_flash=self.use_flash,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, pad_mask, lengths, deterministic)
        return x


class Decoder(nn.Module):
    """PE + N FFT blocks over frame-level features (reference Models.py:115-183).

    Training-time inputs longer than max_seq_len are truncated (with their
    masks) exactly as the reference does; at inference the closed-form PE
    extends to any static length, so no truncation is applied.
    """

    hidden: int = 256
    n_layers: int = 6
    n_head: int = 2
    d_inner: int = 1024
    kernel_size: Tuple[int, int] = (9, 1)
    dropout: float = 0.2
    max_seq_len: int = 1000
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, T, H)
        pad_mask: jnp.ndarray,  # (B, T)
        lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        truncate: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, t, _ = x.shape
        if truncate and t > self.max_seq_len:
            # static slice: reference Models.py:166-174
            t = self.max_seq_len
            x = x[:, :t, :]
            pad_mask = pad_mask[:, :t]
            if lengths is not None:
                lengths = jnp.minimum(lengths, t)

        x = x + sinusoid_table(t, self.hidden, dtype=self.dtype)[None, :, :]
        for i in range(self.n_layers):
            x = FFTBlock(
                self.hidden,
                self.n_head,
                self.d_inner,
                self.kernel_size,
                self.dropout,
                use_flash=self.use_flash,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, pad_mask, lengths, deterministic)
        return x, pad_mask
