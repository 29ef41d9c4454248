"""Parity tests for the fused-MRF Pallas kernel (ops/fused_mrf.py).

The kernel is a documented negative result on v5e (slower than XLA's conv
emitters — see its module docstring / BASELINE.md) but is kept correct:
these tests pin the halo-tile + per-conv-edge-padding semantics against
the plain ResBlock path via the Pallas interpreter.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import pytest

from masg_tpu.models.hifigan import HiFiGANGenerator
from masg_tpu.ops.fused_mrf import chain_halo, fused_mrf_stage

KW = dict(n_mels=8, upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
          upsample_initial_channel=128, resblock_kernel_sizes=(3, 7, 11),
          resblock_dilation_sizes=((1, 3, 5),) * 3)


def test_chain_halo():
    # k=11, dils (1,3,5): units contribute 5d + 5 -> 10 + 20 + 30
    assert chain_halo(11, (1, 3, 5)) == 60
    assert chain_halo(3, (1, 3, 5)) == 12


@pytest.mark.parametrize("T", [37, 64, 200])
def test_fused_generator_matches_plain(T):
    """Full generator with fused C=64/C=32 stages == plain conv path,
    including sequence edges and non-tile-multiple lengths."""
    plain = HiFiGANGenerator(time_packing=False, **KW)
    fused = HiFiGANGenerator(fused_mrf=True, fused_interpret=True, **KW)
    mel = jax.random.normal(jax.random.PRNGKey(T), (2, T, 8), jnp.float32)
    v = plain.init(jax.random.PRNGKey(0), mel)
    y1 = np.asarray(plain.apply(v, mel))
    y2 = np.asarray(fused.apply(v, mel))
    np.testing.assert_allclose(y2, y1, atol=1e-6)


def test_fused_stage_multi_tile_boundaries():
    """Direct stage call with a tile smaller than the sequence: outputs at
    tile boundaries must match the unfused convs (halo correctness)."""
    from masg_tpu.models.hifigan import ResBlock

    C, L = 64, 400
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, L, C)), jnp.float32)
    ks, ds = (3, 7, 11), ((1, 3, 5),) * 3
    mods = [ResBlock(C, k, d) for k, d in zip(ks, ds)]
    variables = [m.init(jax.random.PRNGKey(i), x) for i, m in enumerate(mods)]
    ref = sum(m.apply(v, x) for m, v in zip(mods, variables)) / 3.0
    out = fused_mrf_stage(x, [v["params"] for v in variables], ks, ds,
                          tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
