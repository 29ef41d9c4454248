"""Optimizer: Adam + Noam LR schedule with step anneals.

Exactly reproduces the reference ScheduledOptim (model/optimizer.py:5-51):
  lr(step) = d_model^-0.5 * min(step^-0.5, step * warmup^-1.5)
             * anneal_rate^{#(anneal_steps < step)}
where `step` counts from 1 at the first update (the reference increments
current_step before computing the lr). Gradient clipping is global-norm at
grad_clip_thresh (reference train.py:202); gradient accumulation uses
optax.MultiSteps (reference grad_acc_step).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from ..core.config import OptimizerConfig


def noam_schedule(
    d_model: int,
    warm_up_step: int,
    anneal_steps=(300000, 400000, 500000),
    anneal_rate: float = 0.3,
) -> optax.Schedule:
    init_lr = float(d_model) ** -0.5

    def schedule(count):
        step = jnp.asarray(count, jnp.float32) + 1.0
        lr = jnp.minimum(step ** -0.5, step * float(warm_up_step) ** -1.5)
        for s in anneal_steps:
            lr = jnp.where(step > s, lr * anneal_rate, lr)
        return init_lr * lr

    return schedule


def make_optimizer(opt_cfg: OptimizerConfig, d_model: int) -> optax.GradientTransformation:
    sched = noam_schedule(
        d_model, opt_cfg.warm_up_step, opt_cfg.anneal_steps, opt_cfg.anneal_rate
    )
    tx = optax.chain(
        optax.clip_by_global_norm(opt_cfg.grad_clip_thresh),
        optax.scale_by_adam(
            b1=opt_cfg.betas[0], b2=opt_cfg.betas[1], eps=opt_cfg.eps
        ),
        optax.add_decayed_weights(opt_cfg.weight_decay)
        if opt_cfg.weight_decay
        else optax.identity(),
        optax.scale_by_learning_rate(sched),
    )
    if opt_cfg.grad_acc_step > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=opt_cfg.grad_acc_step)
    return tx
