"""Fused Pallas kernel for HiFi-GAN's narrow-channel MRF stages.

**Status: correct but measured SLOWER than XLA on v5e — kept as a gated,
parity-tested negative result** (BASELINE.md "fused-MRF Pallas kernel"
row). The hypothesis was that the C=64/C=32 stages (32%/17% of MXU peak
under XLA) lose to 18 per-conv HBM round-trips, so computing one WHOLE
stage (3 resblocks x 3 dilation units x 2 convs, residuals, leaky_relus,
the /3 mean) per halo-tile in VMEM should win. Design points that work:

- halo tiles: each program gets its tile plus halo-sized clamped neighbor
  blocks (read amplification (tile+2h)/tile, not 3x); chain halo = 60 rows
  for the k=11 resblock.
- each dilated conv is a chain of per-tap matmuls lhs (W, C) @ w_j (C, C)
  with f32 accumulation — no Toeplitz zero-inflation at any dilation.
- rows outside the true sequence are zeroed after every conv, reproducing
  the unfused path's per-conv zero padding at sequence edges exactly; the
  per-row summation order is position-independent, so chunked (streaming)
  and full synthesis stay consistent. Fused == plain to 5e-11 (f32) and
  2.4e-7 (bf16, vs the time-packed path) on real hardware.

Measured on v5e (B=16, V1 shapes): C=64 stage 39.7 ms vs XLA 21.5 ms;
C=32 stage 77 ms vs 19.7 ms (Toeplitz-packed). Isolated, a single
k=11,d=5 conv in this style reaches 118 TF/s, but the full 18-conv kernel
sinks to 34 TF/s: N=C=64 fills half the MXU lanes, every unaligned tap
slice pays a sublane-shift relayout, and interleaving pads/masks/casts
between the dot chains defeats Mosaic's accumulation fusion. Alternatives
tried and rejected: lane-concat tap-stacking (Mosaic: unsupported offset
concat), scratch-staged tap-stacking (relayout stores, 2x slower), lane-
packed IO with in-kernel unpack (Mosaic: unsupported shape cast). XLA's
conv emitters + the block-Toeplitz pack (models/hifigan.py) remain the
production path; `fused_mrf=False` is the generator default.

Inference-only (pallas_call has no VJP).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1


def chain_halo(kernel_size: int, dilations: Sequence[int]) -> int:
    """Receptive radius of one resblock's conv chain: each dilation unit is
    conv(k, d) then conv(k, 1)."""
    c = (kernel_size - 1) // 2
    return sum(c * d + c for d in dilations)


def _lrelu(x):
    # max form: Mosaic's bf16 path lacks vector float compares
    return jnp.maximum(x, LRELU_SLOPE * x)


def _conv_same(x, wref, b, k: int, d: int, dtype):
    """SAME dilated conv on a (W, C) buffer via per-tap matmuls.

    x: (W, C); wref: (k, C, C) weight ref; b: (1, C). Out-of-buffer taps
    read zeros (local pad) — callers keep a halo so the center rows never
    depend on them.
    """
    wrows, c = x.shape
    half = (k - 1) // 2
    pad = half * d
    xp = jnp.pad(x, ((pad, pad), (0, 0)))
    acc = None
    for j in range(k):
        y = jax.lax.dot_general(xp[j * d:j * d + wrows], wref[j],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    return (acc + b).astype(dtype)


def _mrf_kernel(prevh_ref, cur_ref, nexth_ref, *refs,
                tile: int, halo: int, seq_len: int,
                kernel_sizes: Tuple[int, ...],
                dilation_sizes: Tuple[Tuple[int, ...], ...], dtype):
    """refs: per-conv (weight, bias) pairs flattened per (resblock, unit,
    conv#), then out_ref last."""
    out_ref = refs[-1]
    wrefs = refs[:-1]
    c = cur_ref.shape[-1]
    i = pl.program_id(1)

    xw = jnp.concatenate([prevh_ref[0], cur_ref[0], nexth_ref[0]], axis=0)
    w_rows = tile + 2 * halo
    pos = jax.lax.broadcasted_iota(jnp.int32, (w_rows, 1), 0) + i * tile - halo
    valid = jnp.logical_and(pos >= 0, pos < seq_len)
    xw = jnp.where(valid, xw, 0)

    acc = jnp.zeros((w_rows, c), jnp.float32)
    ri = 0
    for k, dils in zip(kernel_sizes, dilation_sizes):
        h = xw
        for d in dils:
            w1, b1, w2, b2 = (wrefs[ri], wrefs[ri + 1][...],
                              wrefs[ri + 2], wrefs[ri + 3][...])
            ri += 4
            t = _conv_same(_lrelu(h), w1, b1, k, d, dtype)
            t = jnp.where(valid, t, 0)
            t = _conv_same(_lrelu(t), w2, b2, k, 1, dtype)
            t = jnp.where(valid, t, 0)
            h = h + t
        acc = acc + h.astype(jnp.float32)
    out = (acc / len(kernel_sizes)).astype(dtype)
    out_ref[0] = out[halo:halo + tile]


def fused_mrf_stage(
    x: jnp.ndarray,
    block_params: Sequence[dict],
    kernel_sizes: Sequence[int],
    dilation_sizes: Sequence[Sequence[int]],
    tile: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: (B, T, C) -> mean of the resblock outputs, (B, T, C).

    block_params[j] is resblock j's param dict (convs1_{i}_kernel/bias,
    convs2_{i}_kernel/bias with kernels (k, C, C)). C must divide 128.
    """
    b, t, c = x.shape
    dtype = x.dtype
    halo = max(chain_halo(k, d) for k, d in zip(kernel_sizes, dilation_sizes))
    # sublane-aligned halo; the neighbor halo blocks index in halo units,
    # so the tile must be a multiple of the halo
    halo = int(np.ceil(halo / 16) * 16)
    tile = max(halo, min(tile, int(np.ceil(t / 16) * 16)))
    tile = int(np.ceil(tile / halo) * halo)
    n_blocks = -(-t // tile)
    t_pad = n_blocks * tile
    if t_pad != t:
        x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))

    weights = []
    wspecs = []
    for bp, k in zip(block_params, kernel_sizes):
        for i in range(len(dilation_sizes[0])):
            for cn in ("convs1", "convs2"):
                weights.append(bp[f"{cn}_{i}_kernel"].astype(dtype))
                wspecs.append(pl.BlockSpec((k, c, c), lambda bi, ti: (0, 0, 0)))
                weights.append(bp[f"{cn}_{i}_bias"].astype(dtype).reshape(1, c))
                wspecs.append(pl.BlockSpec((1, c), lambda bi, ti: (0, 0)))

    # halo-sized neighbor blocks (clamped at the sequence ends; the position
    # mask zeroes whatever the clamp fetched there)
    hb = tile // halo
    in_specs = [
        pl.BlockSpec((1, halo, c),
                     lambda bi, ti: (bi, jnp.maximum(ti * hb - 1, 0), 0)),
        pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0)),
        pl.BlockSpec((1, halo, c),
                     lambda bi, ti: (bi, jnp.minimum((ti + 1) * hb,
                                                     t_pad // halo - 1), 0)),
    ] + wspecs
    out = pl.pallas_call(
        partial(_mrf_kernel, tile=tile, halo=halo, seq_len=t,
                kernel_sizes=tuple(kernel_sizes),
                dilation_sizes=tuple(tuple(d) for d in dilation_sizes),
                dtype=dtype),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), dtype),
        grid=(b, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0)),
        interpret=interpret,
    )(x, x, x, *weights)
    return out[:, :t]
