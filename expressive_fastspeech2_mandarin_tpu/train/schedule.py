"""Noam warmup/decay LR schedule with step anneals.

Matches the reference ScheduledOptim exactly (reference:
model/optimizer.py:20-43): ``lr = d_model^-0.5 * min(step^-0.5,
warmup^-1.5 * step) * anneal_rate^(#{s in anneal_steps : step > s})`` where
``step`` counts from 1 on the first update (the reference increments before
computing).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from ..config import OptimizerConfig


def noam_schedule(
    d_model: int,
    warmup_steps: int,
    anneal_steps: tuple[int, ...],
    anneal_rate: float,
    lr_scale: float = 1.0,
) -> optax.Schedule:
    init_lr = d_model ** -0.5 * lr_scale

    def schedule(count):
        step = jnp.asarray(count, jnp.float32) + 1.0  # first update = step 1
        scale = jnp.minimum(step ** -0.5, warmup_steps ** -1.5 * step)
        for s in anneal_steps:
            scale = jnp.where(step > s, scale * anneal_rate, scale)
        return init_lr * scale

    return schedule


def make_optimizer(cfg: OptimizerConfig, d_model: int) -> optax.GradientTransformation:
    """Grad-clip + Adam + Noam schedule, with optional gradient accumulation
    (reference: train.py:89-97 clip_grad_norm_ + ScheduledOptim; grad
    accumulation train.py:63,89)."""
    schedule = noam_schedule(d_model, cfg.warm_up_step, cfg.anneal_steps,
                             cfg.anneal_rate, cfg.lr_scale)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_thresh),
        optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps),
        optax.add_decayed_weights(cfg.weight_decay)
        if cfg.weight_decay else optax.identity(),
        optax.scale_by_learning_rate(schedule),
    )
    if cfg.grad_acc_step > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_acc_step)
    return tx
