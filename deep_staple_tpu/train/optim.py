"""Optimizers for the data-parameter vector + LR schedules.

The reference optimizes the DP embedding with `torch.optim.SparseAdam`
(`main_deep_staple.py:442-444`): only rows that received gradients this step
update their moments and values, while bias correction uses the global step
count. On TPU the N<=~3k scalars live in one dense f32 vector; SparseAdam
semantics are reproduced with a touched-row mask (a segment-sum over the batch
axis — sharding-safe under pjit, psum happens implicitly via GSPMD).

The model optimizer is optax.adamw (torch AdamW defaults: betas (0.9, 0.999),
eps 1e-8, weight_decay 0.01 applied to all params — reference :406). LR comes
in as a per-step scalar computed by the driver, reproducing the reference's
quirky schedule (ExponentialLR stepped per *batch* only in epochs where
epx % atlas_count == 0, :794-795).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class SparseAdamState(NamedTuple):
    mu: jnp.ndarray
    nu: jnp.ndarray
    count: jnp.ndarray  # global step count (torch SparseAdam per-param step)


def sparse_adam_init(params: jnp.ndarray) -> SparseAdamState:
    return SparseAdamState(
        mu=jnp.zeros_like(params),
        nu=jnp.zeros_like(params),
        count=jnp.zeros((), jnp.int32),
    )


def sparse_adam_update(
    params: jnp.ndarray,
    grads: jnp.ndarray,
    state: SparseAdamState,
    touched_mask: jnp.ndarray,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """One torch-SparseAdam step on the rows where ``touched_mask`` is True."""
    count = state.count + 1
    t = count.astype(jnp.float32)
    mu_new = b1 * state.mu + (1 - b1) * grads
    nu_new = b2 * state.nu + (1 - b2) * grads * grads
    mu = jnp.where(touched_mask, mu_new, state.mu)
    nu = jnp.where(touched_mask, nu_new, state.nu)
    # 1 - b**t via expm1 keeps f32 accuracy at ~1e-7 (naive power loses ~3e-4
    # for b=0.999, which shows up against torch's float64 bias correction).
    bias_c1 = -jnp.expm1(t * math.log(b1))
    bias_c2 = -jnp.expm1(t * math.log(b2))
    step_size = lr * jnp.sqrt(bias_c2) / bias_c1
    update = step_size * mu / (jnp.sqrt(nu) + eps)
    params = jnp.where(touched_mask, params - update, params)
    return params, SparseAdamState(mu=mu, nu=nu, count=count)


def make_model_optimizer(weight_decay: float = 0.01) -> optax.GradientTransformation:
    """AdamW with injectable LR (driver passes the scheduled value each step)."""
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=0.0, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
    )


def exp_lr(base_lr: float, num_sched_steps: int, gamma: float = 0.99) -> float:
    """torch ExponentialLR value after ``num_sched_steps`` scheduler steps."""
    return base_lr * (gamma**num_sched_steps)


def cosine_warm_restarts_lr(base_lr: float, num_sched_steps: int, t_0: int = 10, t_mult: int = 2, eta_min: float = 0.0) -> float:
    """torch CosineAnnealingWarmRestarts(T_0, T_mult) value (2D path,
    reference :410-411), evaluated at integer scheduler steps."""
    t_cur = num_sched_steps
    t_i = t_0
    while t_cur >= t_i:
        t_cur -= t_i
        t_i *= t_mult
    return eta_min + (base_lr - eta_min) * (1 + math.cos(math.pi * t_cur / t_i)) / 2
