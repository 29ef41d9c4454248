"""Shared transformer building blocks (flax.linen).

Re-designs the reference's FFT block stack (transformer/Layers.py:11-30,
SubLayers.py:8-93) for TPU: heads stay a tensor axis feeding one large einsum
per projection (MXU-friendly) instead of being folded into the batch dim; the
attention core is swappable between a fused XLA path and a Pallas flash kernel.
Post-LN residual placement, conv-FFN kernel sizes, masking and dropout
semantics match the reference exactly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import flash_attention, mha_attention
from ..ops.masks import masked_fill_time


class PaddedEmbed(nn.Module):
    """Embedding table whose PAD row (id 0) is pinned to zeros.

    torch nn.Embedding(padding_idx=0) zero-inits row 0 and never updates it;
    masking the output at pad ids reproduces both the forward value and the
    zero gradient without special-casing the optimizer.
    """

    num_embeddings: int
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        emb = nn.Embed(
            self.num_embeddings,
            self.features,
            dtype=self.dtype,
            name="table",
        )(ids)
        return jnp.where((ids > 0)[..., None], emb, jnp.zeros((), emb.dtype))


class MultiHeadAttention(nn.Module):
    """Post-LN multi-head self-attention (reference SubLayers.py:8-57)."""

    n_head: int
    d_model: int
    dropout: float = 0.1
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pad_mask: Optional[jnp.ndarray],
        lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b, t, _ = x.shape
        d_head = self.d_model // self.n_head
        residual = x

        def proj(name):
            y = nn.Dense(self.n_head * d_head, dtype=self.dtype, name=name)(x)
            return y.reshape(b, t, self.n_head, d_head).transpose(0, 2, 1, 3)

        q, k, v = proj("w_qs"), proj("w_ks"), proj("w_vs")

        if self.use_flash and lengths is not None:
            out = flash_attention(q, k, v, lengths)
        else:
            out = mha_attention(q, k, v, pad_mask)

        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.n_head * d_head)
        out = nn.Dense(self.d_model, dtype=self.dtype, name="fc")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(out + residual)


class PositionwiseFeedForward(nn.Module):
    """Conv1d(k0) -> ReLU -> Conv1d(k1), post-LN residual
    (reference SubLayers.py:60-93; kernel sizes from model.yaml conv_kernel_size)."""

    d_model: int
    d_inner: int
    kernel_size: Tuple[int, int] = (9, 1)
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        residual = x
        h = nn.Conv(
            self.d_inner, (self.kernel_size[0],), padding="SAME", dtype=self.dtype, name="w_1"
        )(x)
        h = nn.relu(h)
        h = nn.Conv(
            self.d_model, (self.kernel_size[1],), padding="SAME", dtype=self.dtype, name="w_2"
        )(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(h + residual)


class FFTBlock(nn.Module):
    """Self-attn -> zero pads -> conv-FFN -> zero pads (reference Layers.py:11-30)."""

    d_model: int
    n_head: int
    d_inner: int
    kernel_size: Tuple[int, int] = (9, 1)
    dropout: float = 0.1
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pad_mask: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x = MultiHeadAttention(
            self.n_head,
            self.d_model,
            self.dropout,
            use_flash=self.use_flash,
            dtype=self.dtype,
            name="slf_attn",
        )(x, pad_mask, lengths, deterministic)
        x = masked_fill_time(x, pad_mask)
        x = PositionwiseFeedForward(
            self.d_model,
            self.d_inner,
            self.kernel_size,
            self.dropout,
            dtype=self.dtype,
            name="pos_ffn",
        )(x, deterministic)
        return masked_fill_time(x, pad_mask)
