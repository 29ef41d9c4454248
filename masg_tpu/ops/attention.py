"""Scaled dot-product multi-head attention.

Replaces the reference's hot kernel (transformer/Modules.py:6-25: bmm -> /sqrt(d_k)
-> masked_fill(-inf) -> softmax -> bmm, with heads folded into the batch dim,
SubLayers.py:42-46). TPU-native design:

- XLA path: one batched einsum per projection; heads kept as a tensor axis so
  the MXU sees large matmuls; pad positions masked with an additive bias.
- Pallas path (`flash_attention`): fused, tiled softmax(QK^T)V that never
  materializes the (T, T) score matrix in HBM — used for long sequences where
  the quadratic intermediates dominate HBM traffic.

Both paths are numerically interchangeable (see tests/test_attention.py).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def mha_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    pad_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Multi-head attention core on (B, H, T, Dh) tensors.

    Args:
      q, k, v: (B, H, T, Dh).
      pad_mask: optional (B, T) bool, True at padded key positions.

    Returns (B, H, T, Dh).
    """
    dh = q.shape[-1]
    scale = 1.0 / math.sqrt(dh)
    # accumulate in at least f32 (bf16 inputs on the MXU); f64 inputs keep f64
    acc_t = jnp.promote_types(q.dtype, jnp.float32)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=acc_t)
    scores = scores * scale
    if pad_mask is not None:
        neg = jnp.asarray(jnp.finfo(scores.dtype).min, scores.dtype)
        scores = jnp.where(pad_mask[:, None, None, :], neg, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=acc_t)
    return out.astype(v.dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention (fused, tiled, online softmax)
# ---------------------------------------------------------------------------


def _flash_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k: int,
                  t_pad: int):
    """One (batch*head, q-block) program: online-softmax over key blocks.

    Refs (per program):
      len_ref: (B*H,) int32 scalar-prefetch — valid key length per batch*head.
      q_ref:   (BLOCK_Q, Dh) q tile.
      k_ref:   (T_pad, Dh) full key rows for this batch*head.
      v_ref:   (T_pad, Dh).
      o_ref:   (BLOCK_Q, Dh) output tile.
      lse_ref: (BLOCK_Q, 128) log-sum-exp of the scaled scores per query row,
        lane-replicated (TPU needs a 128-lane minor dim); -inf for fully
        masked rows. Saved as the softmax residual for the backward kernels.
    """
    valid_len = len_ref[pl.program_id(0)]
    dh = q_ref.shape[-1]
    block_q = q_ref.shape[0]
    scale = 1.0 / math.sqrt(dh)

    q = q_ref[:].astype(jnp.float32) * scale

    # dynamic trip count: key blocks at/after valid_len are fully masked and
    # contribute nothing, so skip their compute (the K/V DMA still moves the
    # whole buffer — at T=1000 that bounds the gain; the win grows with T)
    num_kb = jnp.minimum(
        (valid_len + block_k - 1) // block_k, t_pad // block_k
    )

    def body(kb, carry):
        m_prev, l_prev, acc = carry
        k_tile = k_ref[pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_tile = v_ref[pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_tile, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BLOCK_Q, BLOCK_K)
        col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < valid_len, s, -jnp.inf)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # guard fully-masked tiles: exp(-inf - -inf) -> use safe max
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(s - m_safe)
        p = jnp.where(jnp.isfinite(s), p, 0.0)
        alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_safe), 0.0)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_tile, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, dh), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))

    lse = jnp.where(l > 0.0, jnp.where(jnp.isfinite(m), m, 0.0) + jnp.log(l),
                    -jnp.inf)
    lse_ref[:] = jnp.broadcast_to(lse, (block_q, 128)).astype(jnp.float32)
    l = jnp.where(l == 0.0, 1.0, l)
    o_ref[:] = (acc / l).astype(o_ref.dtype)


def _flash_fwd_call(lens, qf, kf, vf, *, block_q, block_k, t_pad, interpret):
    """pallas_call of the forward kernel on padded (BH, T_pad, Dh) arrays.

    Returns (o, lse_rep) where lse_rep is (BH, T_pad, 128) lane-replicated
    log-sum-exp (the softmax residual the backward kernels consume).
    """
    bh, _, dh = qf.shape
    grid = (bh, t_pad // block_q)
    return pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, t_pad=t_pad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # lengths array lives in SMEM, prefetched
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (None, block_q, dh), lambda bh, qb, lens: (bh, qb, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (None, t_pad, dh), lambda bh, qb, lens: (bh, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (None, t_pad, dh), lambda bh, qb, lens: (bh, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (None, block_q, dh), lambda bh, qb, lens: (bh, qb, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (None, block_q, 128), lambda bh, qb, lens: (bh, qb, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, t_pad, dh), qf.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, 128), jnp.float32),
        ],
        interpret=interpret,
    )(lens, qf, kf, vf)


def _flash_dq_kernel(len_ref, q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                     dq_ref, *, block_k: int, t_pad: int):
    """dQ for one (batch*head, q-block) program.

    Standard FlashAttention backward: recompute p = exp(scale*q@k^T - lse)
    blockwise, ds = p * (do@v^T - delta), dq = scale * sum ds @ k — the (T, T)
    matrices never touch HBM.
    """
    valid_len = len_ref[pl.program_id(0)]
    dh = q_ref.shape[-1]
    block_q = q_ref.shape[0]
    scale = 1.0 / math.sqrt(dh)

    q = q_ref[:].astype(jnp.float32)
    do = do_ref[:].astype(jnp.float32)
    lse = lse_ref[:, :1]  # (BLOCK_Q, 1) f32
    delta = delta_ref[:, :1]
    row_live = jnp.isfinite(lse)

    num_kb = jnp.minimum(
        (valid_len + block_k - 1) // block_k, t_pad // block_k
    )

    def body(kb, acc):
        k_tile = k_ref[pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_tile = v_ref[pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = scale * jax.lax.dot_general(
            q, k_tile, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        p = jnp.where((col < valid_len) & row_live,
                      jnp.exp(s - jnp.where(row_live, lse, 0.0)), 0.0)
        dp = jax.lax.dot_general(
            do, v_tile, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        return acc + jax.lax.dot_general(
            ds, k_tile, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    acc0 = jnp.zeros((block_q, dh), jnp.float32)
    dq = jax.lax.fori_loop(0, num_kb, body, acc0)
    dq_ref[:] = (scale * dq).astype(dq_ref.dtype)


def _flash_dkv_kernel(len_ref, q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                      dk_ref, dv_ref, *, block_q: int, t_pad: int):
    """dK and dV for one (batch*head, k-block) program, looping over q blocks."""
    valid_len = len_ref[pl.program_id(0)]
    kb = pl.program_id(1)
    dh = k_ref.shape[-1]
    block_k = k_ref.shape[0]
    scale = 1.0 / math.sqrt(dh)

    k_tile = k_ref[:].astype(jnp.float32)
    v_tile = v_ref[:].astype(jnp.float32)
    col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
    col_live = col < valid_len  # (1, BLOCK_K)

    # q rows at/after valid_len have lse=-inf => p=0, so skip those blocks;
    # a k block entirely past valid_len contributes nothing at all
    num_qb = jnp.where(
        kb * block_k >= valid_len,
        0,
        jnp.minimum((valid_len + block_q - 1) // block_q, t_pad // block_q),
    )

    def body(qb, carry):
        dk, dv = carry
        q_t = q_ref[pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        do_t = do_ref[pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse_t = lse_ref[pl.ds(qb * block_q, block_q), :1]  # (BLOCK_Q, 1)
        delta_t = delta_ref[pl.ds(qb * block_q, block_q), :1]
        row_live = jnp.isfinite(lse_t)
        s = scale * jax.lax.dot_general(
            q_t, k_tile, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BLOCK_Q, BLOCK_K)
        p = jnp.where(col_live & row_live,
                      jnp.exp(s - jnp.where(row_live, lse_t, 0.0)), 0.0)
        dv = dv + jax.lax.dot_general(
            p, do_t, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # p^T @ do -> (BLOCK_K, Dh)
        dp = jax.lax.dot_general(
            do_t, v_tile, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta_t)
        dk = dk + jax.lax.dot_general(
            ds, q_t, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # ds^T @ q -> (BLOCK_K, Dh)
        return dk, dv

    zeros = jnp.zeros((block_k, dh), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (zeros, zeros))
    dk_ref[:] = (scale * dk).astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _flash_bwd_call(lens, qf, kf, vf, lse_rep, do, delta_rep, *, block_q,
                    block_k, t_pad, interpret):
    """Backward pallas_calls on padded (BH, T_pad, Dh) arrays."""
    bh, _, dh = qf.shape

    row_spec = pl.BlockSpec((None, block_q, dh), lambda bh, qb, lens: (bh, qb, 0),
                            memory_space=pltpu.VMEM)
    row_stat = pl.BlockSpec((None, block_q, 128), lambda bh, qb, lens: (bh, qb, 0),
                            memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((None, t_pad, dh), lambda bh, qb, lens: (bh, 0, 0),
                             memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, block_k=block_k, t_pad=t_pad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, t_pad // block_q),
            in_specs=[row_spec, row_spec, row_stat, row_stat, full_spec, full_spec],
            out_specs=row_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, dh), qf.dtype),
        interpret=interpret,
    )(lens, qf, do, lse_rep, delta_rep, kf, vf)

    key_spec = pl.BlockSpec((None, block_k, dh), lambda bh, kb, lens: (bh, kb, 0),
                            memory_space=pltpu.VMEM)
    full_stat = pl.BlockSpec((None, t_pad, 128), lambda bh, kb, lens: (bh, 0, 0),
                             memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkv_kernel, block_q=block_q, t_pad=t_pad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, t_pad // block_k),
            in_specs=[full_spec, full_spec, full_stat, full_stat, key_spec, key_spec],
            out_specs=[key_spec, key_spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, t_pad, dh), kf.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, dh), vf.dtype),
        ],
        interpret=interpret,
    )(lens, qf, do, lse_rep, delta_rep, kf, vf)
    return dq, dk, dv


@functools.lru_cache(maxsize=None)
def _make_flash_core(block_q: int, block_k: int, t_pad: int, interpret: bool):
    """custom_vjp-wrapped flash attention on padded (BH, T_pad, Dh) arrays.

    Differentiable: the backward pass runs the Pallas dQ/dKV kernels, so
    neither direction ever materializes a (T, T) matrix in HBM — this is what
    makes `--flash` usable in training, where XLA's attention saves the probs
    tensor for the VJP.
    """

    @jax.custom_vjp
    def core(qf, kf, vf, lens):
        o, _ = _flash_fwd_call(lens, qf, kf, vf, block_q=block_q,
                               block_k=block_k, t_pad=t_pad, interpret=interpret)
        return o

    def core_fwd(qf, kf, vf, lens):
        o, lse_rep = _flash_fwd_call(lens, qf, kf, vf, block_q=block_q,
                                     block_k=block_k, t_pad=t_pad,
                                     interpret=interpret)
        return o, (qf, kf, vf, lens, o, lse_rep)

    def core_bwd(res, do):
        qf, kf, vf, lens, o, lse_rep = res
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
        delta_rep = jnp.broadcast_to(delta[..., None], delta.shape + (128,))
        dq, dk, dv = _flash_bwd_call(
            lens, qf, kf, vf, lse_rep, do.astype(qf.dtype), delta_rep,
            block_q=block_q, block_k=block_k, t_pad=t_pad, interpret=interpret,
        )
        return dq, dk, dv, None

    core.defvjp(core_fwd, core_bwd)
    return core


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    block_q: int = 512,
    block_k: int = 256,
) -> jnp.ndarray:
    """Fused masked attention via Pallas, differentiable (custom VJP).

    Block defaults are tuned on a real v5e chip (bench.py sweep, B=8 H=2
    Dh=128 bf16): at T=1000 XLA's fused attention still edges this kernel
    out (~1.0 vs ~1.03 ms), flash wins from T~2000 (1.8 vs 2.1 ms) and by
    43x at T=8000 (8.6 vs 370 ms) where the (T, T) score matrix blows HBM.
    The backward pass is also Pallas (dQ + fused dK/dV kernels recomputing
    probabilities from the saved log-sum-exp), so training with flash keeps
    the same no-(T,T)-in-HBM property.

    Args:
      q, k, v: (B, H, T, Dh); T is padded to a multiple of the block sizes
        internally.
      lengths: (B,) int32 valid key lengths (pad positions masked out).

    Returns (B, H, T, Dh), zero rows for fully-masked queries.
    """
    import math as _math

    b, h, t, dh = q.shape
    # clamp blocks to the power-of-two-of-128 cover of T: the long-T tuned
    # defaults (512, 256) would otherwise pad an L=128 encoder sequence to
    # 512 rows and run ~8x the needed work
    t_cover = 128 * (1 << max(0, (-(-t // 128) - 1).bit_length()))
    block_q = min(block_q, t_cover)
    block_k = min(block_k, t_cover)
    # pad T to a multiple of BOTH block sizes so no key block is dropped
    block_lcm = _math.lcm(block_q, block_k)
    t_pad = block_lcm * -(-t // block_lcm)

    def pad_t(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))

    qf = pad_t(q).reshape(b * h, t_pad, dh)
    kf = pad_t(k).reshape(b * h, t_pad, dh)
    vf = pad_t(v).reshape(b * h, t_pad, dh)
    lens = jnp.repeat(lengths.astype(jnp.int32), h)  # (B*H,)

    # off-TPU (CPU tests, --flash on a dev box) the kernel runs in pallas
    # interpret mode: same numerics, no Mosaic lowering required
    interpret = jax.default_backend() != "tpu"

    core = _make_flash_core(block_q, block_k, t_pad, interpret)
    out = core(qf, kf, vf, lens)
    return out.reshape(b, h, t_pad, dh)[:, :, :t, :]
