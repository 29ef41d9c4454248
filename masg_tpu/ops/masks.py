"""Sequence mask utilities.

Convention follows the reference (utils/tools.py:155-163): a *pad mask* is True
at PADDED positions (ids >= length). Loss code and attention both consume this
polarity, so we keep it to preserve semantics; helpers below convert.
"""

from __future__ import annotations

import jax.numpy as jnp


def pad_mask_from_lengths(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_len) bool mask, True where position is padding.

    Reference: get_mask_from_lengths (utils/tools.py:155-163). max_len must be
    static under jit; callers pass the padded batch length.
    """
    ids = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return ids >= lengths[:, None]


def valid_mask_from_lengths(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """True at VALID (non-pad) positions."""
    return ~pad_mask_from_lengths(lengths, max_len)


def attn_pad_bias(pad_mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, Tk) pad mask -> (B, 1, 1, Tk) additive bias with -inf at pads.

    Matches ScaledDotProductAttention's masked_fill(-inf) before softmax
    (reference transformer/Modules.py:16-23).
    """
    neg = jnp.asarray(jnp.finfo(dtype).min, dtype)
    return jnp.where(pad_mask[:, None, None, :], neg, jnp.asarray(0, dtype))


def masked_fill_time(x: jnp.ndarray, pad_mask: jnp.ndarray, value: float = 0.0) -> jnp.ndarray:
    """Zero (or `value`) out padded time steps of (B, T, H) given (B, T) pad mask.

    Matches FFTBlock's post-sublayer masked_fill (transformer/Layers.py:25,28).
    """
    return jnp.where(pad_mask[..., None], jnp.asarray(value, x.dtype), x)
