"""Optimizer: Adam + Noam LR schedule with step anneals.

Exactly reproduces the reference ScheduledOptim (model/optimizer.py:5-51):
  lr(step) = d_model^-0.5 * min(step^-0.5, step * warmup^-1.5)
             * anneal_rate^{#(anneal_steps < step)}
where `step` counts from 1 at the first update (the reference increments
current_step before computing the lr). Gradient clipping is global-norm at
grad_clip_thresh (reference train.py:202); gradient accumulation uses
optax.MultiSteps (reference grad_acc_step).

The Adam transform here is our own rather than optax.scale_by_adam: XLA's
`pow` lowering is only float32-accurate even for f64 operands (measured
2e-7 relative on 0.9**1 under jit — both `lax.pow` and the exp/log route),
which puts a uniform ~7e-7 scalar error on every Adam update via the bias
corrections. torch computes them with correctly-rounded libm pow, so the
torch-trajectory parity tests (tests/test_torch_train_parity.py) would see
that drift compound every step. `_pow_int` computes decay**count by binary
exponentiation — every step a correctly-rounded multiply, ~1e-14 relative —
making the update math semantically identical to torch Adam
(torch/optim/adam.py single-tensor path) in both f32 and f64.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

from ..core.config import OptimizerConfig


def _pow_int(base: float, count) -> jnp.ndarray:
    """base**count for a traced non-negative integer count, via binary
    exponentiation in the default float dtype (f32 in training, f64 under
    the x64 parity tests). O(log count) scalar multiplies — noise next to a
    train step, and each multiply is correctly rounded, unlike XLA pow."""
    ftype = jnp.result_type(float)

    def body(s):
        r, b, n = s
        r = jnp.where(n & 1, r * b, r)
        return r, b * b, n >> 1

    r, _, _ = lax.while_loop(
        lambda s: s[2] > 0,
        body,
        (jnp.asarray(1.0, ftype), jnp.asarray(base, ftype),
         jnp.asarray(count, jnp.int32)),
    )
    return r


class ScaleByAdamTorchState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def scale_by_adam_torch(
    b1: float = 0.9, b2: float = 0.98, eps: float = 1e-9, moment_dtype=None
) -> optax.GradientTransformation:
    """torch.optim.Adam's exact update math (single-tensor path):
      m <- b1*m + (1-b1)*g;  v <- b2*v + (1-b2)*g^2
      update = (m / (1-b1^t)) / (sqrt(v)/sqrt(1-b2^t) + eps)
    with bias corrections from `_pow_int` (see module docstring) and eps
    OUTSIDE the sqrt, after the bias-corrected denominator — torch's
    placement, which optax matches only up to its sloppy pow.

    moment_dtype (e.g. jnp.bfloat16) stores mu/nu quantized to halve the
    optimizer's HBM traffic; the moment math still runs in the gradient
    dtype. None (default) keeps the exact torch semantics."""

    def _store(x, like):
        return x.astype(moment_dtype) if moment_dtype is not None else x

    def init_fn(params):
        zeros = (lambda p: jnp.zeros(p.shape, moment_dtype)
                 if moment_dtype is not None else jnp.zeros_like(p))
        return ScaleByAdamTorchState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree.map(
            lambda g, m: _store(b1 * m.astype(g.dtype) + (1 - b1) * g, g),
            updates, state.mu)
        nu = jax.tree.map(
            lambda g, v: _store(b2 * v.astype(g.dtype) + (1 - b2) * (g * g), g),
            updates, state.nu)
        count = state.count + 1
        bc1 = 1 - _pow_int(b1, count)
        bc2_sqrt = jnp.sqrt(1 - _pow_int(b2, count))
        new_updates = jax.tree.map(
            lambda g, m, v: ((m.astype(g.dtype) / bc1.astype(g.dtype))
                             / (jnp.sqrt(v.astype(g.dtype))
                                / bc2_sqrt.astype(g.dtype) + eps)),
            updates, mu, nu,
        )
        return new_updates, ScaleByAdamTorchState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def _is_lstm_bias_path(path) -> bool:
    """True for the folded bias of an LSTM cell (torch carries it as TWO
    parameters, bias_ih + bias_hh, which always see identical gradients).

    Matched structurally, not by module name: a flax (Optimized)LSTMCell puts
    its bias on the h-side gate Denses, so the leaf path ends .../h{i,f,g,o}/
    bias — this catches cells named anything (speaker-encoder LSTM stacks AND
    JDIT's attention_rnn/decoder_rnn)."""
    keys = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
    return (len(keys) >= 2 and keys[-1] == "bias"
            and keys[-2] in ("hi", "hf", "hg", "ho"))


def clip_by_global_norm_torch(
    max_norm: float, subtree: str = None, lstm_bias_double_count: bool = False
) -> optax.GradientTransformation:
    """torch.nn.utils.clip_grad_norm_'s exact semantics (reference
    train.py:202): coef = max_norm / (norm + 1e-6), clamped to 1.0, applied
    unconditionally. optax.clip_by_global_norm omits the 1e-6 fudge.

    `subtree` restricts BOTH the norm and the scaling to updates[subtree]:
    the reference's ganlike trainer clips `model.parameters()` only — the
    FS2 half — while its single ScheduledOptim also updates the (unclipped)
    discriminator (train_ganlike.py:85,173).

    `lstm_bias_double_count`: torch's global norm sums the squared gradient
    of bias_ih AND bias_hh (identical values) per LSTM cell; our folded
    single-bias cells must count that contribution twice to clip at the same
    point (only matters when an LSTM — JDIT teacher — is inside the clipped
    tree AND the clip binds)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        tree = updates[subtree] if subtree else updates
        norm_sq = optax.global_norm(tree) ** 2
        if lstm_bias_double_count:
            sq = jax.tree_util.tree_map_with_path(
                lambda path, g: jnp.sum(g * g)
                if _is_lstm_bias_path(path) else jnp.zeros((), g.dtype),
                tree,
            )
            norm_sq = norm_sq + jax.tree_util.tree_reduce(jnp.add, sq)
        norm = jnp.sqrt(norm_sq)
        coef = jnp.minimum(max_norm / (norm + 1e-6), 1.0)
        scaled = jax.tree.map(lambda g: g * coef.astype(g.dtype), tree)
        if subtree:
            out = dict(updates)
            out[subtree] = scaled
            return out, state
        return scaled, state

    return optax.GradientTransformation(init_fn, update_fn)


def add_decayed_weights_torch_lstm(weight_decay: float) -> optax.GradientTransformation:
    """L2-into-grad weight decay with HALF decay on folded LSTM biases.

    torch decays bias_ih and bias_hh separately (wd*b each); our folded
    B = b_ih + b_hh would receive wd*B = 2*wd*b — twice torch's per-bias
    term. Halving restores per-bias gradients exactly whenever
    b_ih == b_hh (the GE2E reference zero-inits both,
    speech_embedder_net.py:74-77, and equal biases receive identical
    updates so they stay equal), which combined with
    double_lstm_bias_updates makes the folded trajectory match the torch
    two-bias sum under weight decay too."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("add_decayed_weights_torch_lstm requires params")
        new = jax.tree_util.tree_map_with_path(
            lambda path, u, p: u + weight_decay
            * (0.5 if _is_lstm_bias_path(path) else 1.0) * p,
            updates, params,
        )
        return new, state

    return optax.GradientTransformation(init_fn, update_fn)


def double_lstm_bias_updates() -> optax.GradientTransformation:
    """torch two-bias LSTM compat: scale post-Adam updates on LSTM-cell bias
    leaves by 2.

    torch's nn.LSTM carries separate `bias_ih`/`bias_hh` per gate; both enter
    the cell additively, so they ALWAYS receive identical gradients, identical
    Adam moments, and identical per-step updates — their SUM therefore moves
    by 2x the single-parameter Adam step. Our flax cells fold the two into one
    bias (forward-identical), so exact training parity with the reference's
    joint ganlike optimizer (train_ganlike.py:85 `ScheduledOptim(ganlike,...)`
    over the discriminator's nn.LSTM) requires doubling the folded bias's
    update. Exact whenever weight_decay == 0 (all reference configs)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        return jax.tree_util.tree_map_with_path(
            lambda path, u: u * 2.0 if _is_lstm_bias_path(path) else u,
            updates,
        ), state

    return optax.GradientTransformation(init_fn, update_fn)


class MasterParamsState(NamedTuple):
    master: Any  # float32 master copy of the (bfloat16-stored) params
    inner: Any


def with_master_params(
    inner: optax.GradientTransformation,
) -> optax.GradientTransformation:
    """bf16 parameter storage with an f32 master copy (mixed precision).

    The train step is HBM-bandwidth-bound (BASELINE.md: 105.9 FLOP/byte vs
    the ~240 v5e ridge point), so halving the bytes the fwd/bwd passes read
    for parameters is the lever — params live in bfloat16 in the train state
    while the optimizer chain (clip -> Adam -> lr) runs on a float32 master
    kept in this wrapper's state, exactly as it would in pure-f32 training:

      g_f32 = f32(grads);  master += inner(g_f32)
      emitted update u = master_new - f32(params)

    optax.apply_updates casts (params + u) back to the params' dtype, so the
    new stored params are bf16(master_new) (up to one f32 rounding). Only
    float leaves are cast; integer leaves pass through.
    """

    def _f32(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    def init_fn(params):
        master = _f32(params)
        return MasterParamsState(master=master, inner=inner.init(master))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("with_master_params requires params")
        g32 = _f32(updates)
        inner_updates, inner_state = inner.update(g32, state.inner, state.master)
        master = optax.apply_updates(state.master, inner_updates)
        out = jax.tree.map(
            lambda m, p: m - p.astype(m.dtype) if jnp.issubdtype(
                p.dtype, jnp.floating) else jnp.zeros_like(p),
            master, params)
        return out, MasterParamsState(master=master, inner=inner_state)

    return optax.GradientTransformation(init_fn, update_fn)


def noam_schedule(
    d_model: int,
    warm_up_step: int,
    anneal_steps=(300000, 400000, 500000),
    anneal_rate: float = 0.3,
) -> optax.Schedule:
    init_lr = float(d_model) ** -0.5

    def schedule(count):
        # default float dtype: f32 in training, f64 under the x64-mode
        # torch-trajectory parity tests (torch computes the lr in double).
        # step^-0.5 via 1/sqrt: both ops correctly rounded, where XLA pow
        # is not (see module docstring).
        step = jnp.asarray(count, jnp.result_type(float)) + 1.0
        lr = jnp.minimum(1.0 / jnp.sqrt(step), step * float(warm_up_step) ** -1.5)
        for s in anneal_steps:
            lr = jnp.where(step > s, lr * anneal_rate, lr)
        return init_lr * lr

    return schedule


def make_optimizer(
    opt_cfg: OptimizerConfig, d_model: int, clip_subtree: str = None,
    torch_lstm_bias_compat: bool = False, param_storage: str = "f32",
) -> optax.GradientTransformation:
    """param_storage: "f32" (default, torch-exact), "bf16" (bf16 params +
    f32 master copy + f32 moments — see with_master_params), or
    "bf16_moments" (bf16 params AND bf16 Adam moments: least HBM traffic).
    With grad accumulation, MultiSteps accumulates in the gradient dtype, so
    bf16 storage + grad_acc trades a little accumulation precision too."""
    moment_dtype = jnp.bfloat16 if param_storage == "bf16_moments" else None
    sched = noam_schedule(
        d_model, opt_cfg.warm_up_step, opt_cfg.anneal_steps, opt_cfg.anneal_rate
    )
    tx = optax.chain(
        clip_by_global_norm_torch(opt_cfg.grad_clip_thresh, clip_subtree,
                                  lstm_bias_double_count=torch_lstm_bias_compat),
        # torch Adam's weight_decay is L2-into-gradient (BEFORE the Adam
        # moments), not AdamW-style decoupled decay — keep that placement
        # (reference configs all use 0.0, but semantics should match anyway);
        # under the LSTM compat the folded bias takes half decay (see
        # add_decayed_weights_torch_lstm)
        (add_decayed_weights_torch_lstm(opt_cfg.weight_decay)
         if torch_lstm_bias_compat
         else optax.add_decayed_weights(opt_cfg.weight_decay))
        if opt_cfg.weight_decay
        else optax.identity(),
        scale_by_adam_torch(
            b1=opt_cfg.betas[0], b2=opt_cfg.betas[1], eps=opt_cfg.eps,
            moment_dtype=moment_dtype,
        ),
        # ganlike only: the discriminator's LSTM biases (see docstring)
        double_lstm_bias_updates()
        if torch_lstm_bias_compat
        else optax.identity(),
        optax.scale_by_learning_rate(sched),
    )
    if param_storage in ("bf16", "bf16_moments"):
        tx = with_master_params(tx)
    if opt_cfg.grad_acc_step > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=opt_cfg.grad_acc_step)
    return tx
