"""Pallas flash-attention kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from masg_tpu.ops.attention import flash_attention, mha_attention


def test_flash_matches_xla_interpret():
    B, H, T, Dh = 2, 2, 256, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32)
    lengths = jnp.asarray([256, 100], jnp.int32)
    pad = jnp.arange(T)[None, :] >= lengths[:, None]

    ref = np.asarray(mha_attention(q, k, v, pad))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(flash_attention(q, k, v, lengths))

    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_flash_ragged_and_padding():
    """Non-multiple-of-block T and very short sequences."""
    B, H, T, Dh = 3, 1, 200, 32  # T=200 pads to 256 internally
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32)
    lengths = jnp.asarray([200, 64, 3], jnp.int32)
    pad = jnp.arange(T)[None, :] >= lengths[:, None]

    ref = np.asarray(mha_attention(q, k, v, pad))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(flash_attention(q, k, v, lengths))
    np.testing.assert_allclose(out, ref, atol=2e-5)
