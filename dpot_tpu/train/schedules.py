"""Per-iteration LR schedules.

The six schedules selectable in the reference entry scripts
(train_temporal.py:138-156), stepped per optimizer step. All return an
optax-style schedule: step -> lr.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def onecycle(
    max_lr: float,
    total_steps: int,
    warmup_epochs: float,
    epochs: float,
    div_factor: float = 1e4,
    final_div_factor: float = 1e4,
):
    """torch OneCycleLR with cos anneal, exact formula (reference 'cycle'
    default, train_temporal.py:138-140). Matches torch's fenceposts:
    warmup spans [0, pct_start*total - 1], anneal spans the rest, final lr
    = initial/final_div_factor at the last step."""
    initial = max_lr / div_factor
    min_lr = initial / final_div_factor
    pct_start = min(max(warmup_epochs / epochs, 0.0), 0.95)
    up = max(float(pct_start * total_steps) - 1.0, 1e-9)
    down = max(float(total_steps - 1) - up, 1e-9)

    def _anneal(start, end, pct):
        return end + (start - end) / 2.0 * (1.0 + jnp.cos(jnp.pi * pct))

    def schedule(count):
        c = jnp.asarray(count, jnp.float32)
        lr_up = _anneal(initial, max_lr, jnp.clip(c / up, 0.0, 1.0))
        lr_down = _anneal(max_lr, min_lr, jnp.clip((c - up) / down, 0.0, 1.0))
        return jnp.where(c <= up, lr_up, lr_down)

    return schedule


def onecycle_momentum(
    total_steps: int,
    warmup_epochs: float,
    epochs: float,
    base_momentum: float = 0.85,
    max_momentum: float = 0.95,
):
    """torch OneCycleLR's cycle_momentum=True beta1 trajectory (its
    DEFAULT, which the reference never disables for 'cycle'): beta1 starts
    at max_momentum, cos-anneals to base_momentum at peak lr, back to
    max_momentum at the end — torch writes it into group['betas'] each
    step and the reference's hand-rolled Adam/Lamb read group['betas']
    per step (utils/optimizer.py:120,287), so the reference's 'cycle'
    runs ALWAYS train with cycled beta1 (the --beta1 flag is overwritten).
    Same fenceposts as onecycle(); feed to build_optimizer(beta1=...)."""
    pct_start = min(max(warmup_epochs / epochs, 0.0), 0.95)
    up = max(float(pct_start * total_steps) - 1.0, 1e-9)
    down = max(float(total_steps - 1) - up, 1e-9)

    def _anneal(start, end, pct):
        return end + (start - end) / 2.0 * (1.0 + jnp.cos(jnp.pi * pct))

    def schedule(count):
        c = jnp.asarray(count, jnp.float32)
        m_up = _anneal(max_momentum, base_momentum, jnp.clip(c / up, 0.0, 1.0))
        m_down = _anneal(
            base_momentum, max_momentum, jnp.clip((c - up) / down, 0.0, 1.0)
        )
        return jnp.where(c <= up, m_up, m_down)

    return schedule


def step_decay(base_lr: float, step_size: int, gamma: float = 0.5):
    """torch StepLR stepped per iteration (train_temporal.py:142)."""

    def schedule(count):
        return base_lr * gamma ** jnp.floor(count / step_size)

    return schedule


def warmup_inv_sqrt(base_lr: float, warmup_steps: int):
    """LambdaLR(min((s+1)/warmup, sqrt(warmup/(s+1)))) (train_temporal.py:146)."""

    def schedule(count):
        s = jnp.asarray(count, jnp.float32) + 1.0
        return base_lr * jnp.minimum(s / warmup_steps, jnp.sqrt(warmup_steps / s))

    return schedule


def linear_decay(base_lr: float, total_steps: int):
    """LambdaLR(1 - s/total) (train_temporal.py:149)."""

    def schedule(count):
        return base_lr * (1.0 - jnp.asarray(count, jnp.float32) / total_steps)

    return schedule


def cosine_restarts(base_lr: float, t0_steps: int):
    """CosineAnnealingWarmRestarts(T_0, eta_min=0) (train_temporal.py:152)."""

    def schedule(count):
        t = jnp.mod(jnp.asarray(count, jnp.float32), t0_steps) / t0_steps
        return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * t))

    return schedule


def cyclic_triangular2(
    base_lr: float = 1e-5, max_lr: float = 1e-3, step_size_up: int = 1000
):
    """CyclicLR(mode='triangular2') (train_temporal.py:154)."""

    def schedule(count):
        c = jnp.asarray(count, jnp.float32)
        cycle = jnp.floor(1.0 + c / (2.0 * step_size_up))
        x = jnp.abs(c / step_size_up - 2.0 * cycle + 1.0)
        scale = 1.0 / (2.0 ** (cycle - 1.0))
        return base_lr + (max_lr - base_lr) * jnp.maximum(0.0, 1.0 - x) * scale

    return schedule


def build_schedule(
    method: str,
    lr: float,
    steps_per_epoch: int,
    epochs: int,
    warmup_epochs: float = 5,
    step_size: int = 100,
    step_gamma: float = 0.5,
    lr_step_size: int = 20,
):
    """Schedule dispatch matching train_temporal.py:138-156."""
    total = steps_per_epoch * epochs
    if method == "cycle":
        return onecycle(lr, total, warmup_epochs, epochs)
    if method == "step":
        return step_decay(lr, step_size * steps_per_epoch, step_gamma)
    if method == "warmup":
        return warmup_inv_sqrt(lr, warmup_epochs * steps_per_epoch)
    if method == "linear":
        return linear_decay(lr, total)
    if method == "restart":
        return cosine_restarts(lr, lr_step_size * steps_per_epoch)
    if method == "cyclic":
        return cyclic_triangular2(step_size_up=lr_step_size * steps_per_epoch)
    raise ValueError(f"unknown lr schedule {method!r}")
