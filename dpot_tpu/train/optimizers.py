"""Complex-safe optimizers as optax gradient transformations.

Update rules pinned to the reference's hand-rolled functional optimizers
(utils/optimizer.py): `adam` (:9-52, coupled weight decay added to the
gradient), `adamw` (:170-212, decoupled step-weight decay), and `lamb`
(:380-499, trust-ratio with clamp, optional adam mode / debias — the
training scripts use adam=True, debias=False, wd=1e-4,
train_temporal.py:133).

Complex parameters (FNO spectral weights) are handled the way the
reference's `addcmul_(grad, grad.conj())` does (utils/optimizer.py:41,201):
the second moment is |g|^2 (real), the first moment stays complex. This is
what makes Adam correct for complex params; stock torch.optim.Adam at the
time squared the gradient without conjugation.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax

Schedule = Union[float, Callable[[jax.Array], jax.Array]]


def _lr_at(lr: Schedule, step: jax.Array) -> jax.Array:
    return lr(step) if callable(lr) else jnp.asarray(lr)


def _global_norm(grads) -> jax.Array:
    return jnp.sqrt(
        sum(jnp.sum(_abs_sq(g)) for g in jax.tree.leaves(grads))
    )


def _abs_sq(g: jax.Array) -> jax.Array:
    """g * conj(g) as a real array (second-moment accumulator).

    Half-precision gradients (the bf16 working-copy fast path hands the
    optimizer bf16 cotangents) are upcast first: squaring/summing in bf16
    would both overflow early and accumulate at ~3 decimal digits."""
    if jnp.iscomplexobj(g):
        return jnp.square(g.real) + jnp.square(g.imag)
    if g.dtype in (jnp.bfloat16, jnp.float16):
        g = g.astype(jnp.float32)
    return jnp.square(g)


class AdamState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any
    grad_norm: jax.Array = None  # pre-clip global norm of the last step


def adam(
    learning_rate: Schedule,
    b1: Union[float, Callable] = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-6,
    clip_norm: Optional[float] = None,
    moment_dtype: Optional[Any] = None,
) -> optax.GradientTransformation:
    """Reference Adam (utils/optimizer.py:9-52): coupled weight decay,
    bias-corrected, complex-safe. clip_norm fuses the global-norm grad
    clip into the update (single memory pass instead of a chained
    transform materializing scaled gradients)."""

    def init(params):
        return AdamState(
            count=jnp.zeros([], jnp.int32),
            mu=_moment_init(params, moment_dtype),
            nu=_moment_init(params, moment_dtype, real_only=True),
            grad_norm=jnp.zeros([], jnp.float32),
        )

    def update(grads, state, params):
        count = state.count + 1
        # b1 may be a schedule (onecycle_momentum — torch OneCycleLR's
        # cycle_momentum writes the CURRENT beta1 into the group each step
        # and the reference optimizers use it everywhere, including the
        # bias correction, utils/optimizer.py:120-127)
        b1c = _lr_at(b1, state.count)
        bc1 = 1.0 - b1c ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        gnorm = _global_norm(grads)
        cs = (
            jnp.minimum(1.0, clip_norm / (gnorm + 1e-6))
            if clip_norm is not None
            else 1.0
        )
        # accumulate in the grad's (f32/c64) precision, store in the
        # moment's dtype (a no-op unless moment_dtype narrows it)
        mu = jax.tree.map(
            lambda m, g, p: (
                b1c * _acc(m) + (1 - b1c) * (_gacc(g) * cs + weight_decay * p)
            ).astype(m.dtype),
            state.mu, grads, params,
        )
        nu = jax.tree.map(
            lambda v, g, p: (
                b2 * _acc(v) + (1 - b2) * _abs_sq(_gacc(g) * cs + weight_decay * p)
            ).astype(v.dtype),
            state.nu, grads, params,
        )
        lr = _lr_at(learning_rate, state.count)
        step_size = lr / bc1

        def upd(p, m, v):
            denom = jnp.sqrt(v.astype(_real_dtype(p))) / jnp.sqrt(bc2) + eps
            return (-step_size * (m.astype(p.dtype) / denom)).astype(p.dtype)

        updates = jax.tree.map(upd, params, mu, nu)
        return updates, AdamState(count=count, mu=mu, nu=nu, grad_norm=gnorm)

    return optax.GradientTransformation(init, update)


def adamw(
    learning_rate: Schedule,
    b1: Union[float, Callable] = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
    clip_norm: Optional[float] = None,
    moment_dtype: Optional[Any] = None,
) -> optax.GradientTransformation:
    """Reference AdamW (utils/optimizer.py:170-212): decoupled decay
    p *= (1 - lr*wd) folded into the additive update."""

    def init(params):
        return AdamState(
            count=jnp.zeros([], jnp.int32),
            mu=_moment_init(params, moment_dtype),
            nu=_moment_init(params, moment_dtype, real_only=True),
            grad_norm=jnp.zeros([], jnp.float32),
        )

    def update(grads, state, params):
        count = state.count + 1
        b1c = _lr_at(b1, state.count)  # may be a schedule (see adam)
        bc1 = 1.0 - b1c ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        gnorm = _global_norm(grads)
        cs = (
            jnp.minimum(1.0, clip_norm / (gnorm + 1e-6))
            if clip_norm is not None
            else 1.0
        )
        mu = jax.tree.map(
            lambda m, g: (b1c * _acc(m) + (1 - b1c) * (_gacc(g) * cs)).astype(m.dtype),
            state.mu, grads,
        )
        nu = jax.tree.map(
            lambda v, g: (
                b2 * _acc(v) + (1 - b2) * _abs_sq(_gacc(g) * cs)
            ).astype(v.dtype),
            state.nu, grads,
        )
        lr = _lr_at(learning_rate, state.count)
        step_size = lr / bc1

        def upd(p, m, v):
            denom = jnp.sqrt(v.astype(_real_dtype(p))) / jnp.sqrt(bc2) + eps
            return (
                -lr * weight_decay * p - step_size * (m.astype(p.dtype) / denom)
            ).astype(p.dtype)

        updates = jax.tree.map(upd, params, mu, nu)
        return updates, AdamState(count=count, mu=mu, nu=nu, grad_norm=gnorm)

    return optax.GradientTransformation(init, update)


def lamb(
    learning_rate: Schedule,
    b1: Union[float, Callable] = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 1e-4,
    clamp_value: float = 10.0,
    adam_mode: bool = True,
    debias: bool = False,
    clip_norm: Optional[float] = None,
    moment_dtype: Optional[Any] = None,
) -> optax.GradientTransformation:
    """Reference Lamb (utils/optimizer.py:380-499). The training scripts run
    it with adam=True, debias=False (train_temporal.py:133): no bias
    correction, eps added directly to sqrt(v), trust ratio forced to 1 but
    the Lamb-style update (m/(sqrt(v)+eps) + wd*p) retained."""

    def init(params):
        return AdamState(
            count=jnp.zeros([], jnp.int32),
            mu=_moment_init(params, moment_dtype),
            nu=_moment_init(params, moment_dtype, real_only=True),
            grad_norm=jnp.zeros([], jnp.float32),
        )

    def update(grads, state, params):
        count = state.count + 1
        b1c = _lr_at(b1, state.count)  # may be a schedule (see adam)
        gnorm = _global_norm(grads)
        cs = (
            jnp.minimum(1.0, clip_norm / (gnorm + 1e-6))
            if clip_norm is not None
            else 1.0
        )
        mu = jax.tree.map(
            lambda m, g: (b1c * _acc(m) + (1 - b1c) * (_gacc(g) * cs)).astype(m.dtype),
            state.mu, grads,
        )
        nu = jax.tree.map(
            lambda v, g: (
                b2 * _acc(v) + (1 - b2) * _abs_sq(_gacc(g) * cs)
            ).astype(v.dtype),
            state.nu, grads,
        )
        if debias:
            cf = count.astype(jnp.float32)
            bias_correction = jnp.sqrt(1.0 - b2**cf) / (1.0 - b1c**cf)
        else:
            bias_correction = 1.0
        lr = _lr_at(learning_rate, state.count)
        step_size = lr * bias_correction

        def upd(p, m, v):
            adam_step = m.astype(p.dtype) / (jnp.sqrt(v.astype(_real_dtype(p))) + eps)
            if weight_decay != 0.0:
                adam_step = adam_step + weight_decay * p
            if adam_mode:
                trust_ratio = 1.0
            else:
                weight_norm = jnp.clip(
                    jnp.linalg.norm(jnp.ravel(p)), 0.0, clamp_value
                )
                adam_norm = jnp.linalg.norm(jnp.ravel(adam_step))
                trust_ratio = jnp.where(
                    (weight_norm == 0.0) | (adam_norm == 0.0),
                    1.0,
                    weight_norm / jnp.maximum(adam_norm, 1e-30),
                )
            return (-step_size * trust_ratio * adam_step).astype(p.dtype)

        updates = jax.tree.map(upd, params, mu, nu)
        return updates, AdamState(count=count, mu=mu, nu=nu, grad_norm=gnorm)

    return optax.GradientTransformation(init, update)


def _real_dtype(p: jax.Array) -> jnp.dtype:
    return jnp.zeros((), p.dtype).real.dtype


def _gacc(g):
    """Promote a half-precision gradient leaf to f32 for the moment
    accumulation arithmetic (bf16 working-copy path; see _abs_sq)."""
    if g.dtype in (jnp.bfloat16, jnp.float16):
        return g.astype(jnp.float32)
    return g


def _acc(x):
    """Promote a reduced-precision STORED moment to its accumulation dtype
    before the decay multiply. Without this, weak-type promotion casts the
    Python decay constants to the moment's dtype — and bf16(0.999) rounds
    to exactly 1.0, so the second moment would never decay (complex/f32
    moments pass through untouched)."""
    import jax.numpy as jnp

    if x.dtype in (jnp.bfloat16, jnp.float16):
        return x.astype(jnp.float32)
    return x


def _moment_init(params, moment_dtype, real_only=False):
    """Zero moments, optionally stored in a reduced dtype. moment_dtype
    applies to the FIRST moment only: b1=0.9 decays 10%/step, far above
    bf16's ~0.4% ULP near 1, so a bf16 mu tracks the f32 EMA fine — but
    b2=0.999 decays 0.1%/step, BELOW that ULP, so a bf16 nu absorbs the
    decay and freezes (0.999*v rounds back to v). nu therefore always
    stays in the param's real dtype (real_only); cutting mu is still a
    25% HBM/traffic cut on the HBM-bound optimizer pass. Complex leaves
    keep their complex dtype (no complex-bf16). Accumulation happens in
    f32 (_acc), only the STORED moment is cast."""

    def one(p):
        dt = _real_dtype(p) if real_only else p.dtype
        if (
            moment_dtype is not None
            and not real_only
            and not jnp.issubdtype(dt, jnp.complexfloating)
        ):
            dt = moment_dtype
        return jnp.zeros(p.shape, dt)

    return jax.tree.map(one, params)


def clip_by_global_norm(max_norm: float) -> optax.GradientTransformation:
    """torch.nn.utils.clip_grad_norm_ equivalent (train_temporal.py:228):
    scale ALL grads by max_norm/total_norm when total_norm > max_norm.
    Complex-safe (uses |g|^2)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(grads, state, params=None):
        del params
        leaves = jax.tree.leaves(grads)
        total = jnp.sqrt(sum(jnp.sum(_abs_sq(g)) for g in leaves))
        scale = jnp.minimum(1.0, max_norm / (total + 1e-6))
        return jax.tree.map(lambda g: g * scale, grads), state

    return optax.GradientTransformation(init, update)


def build_optimizer(
    name: str,
    learning_rate: Schedule,
    beta1: Union[float, Callable] = 0.9,
    beta2: float = 0.999,
    grad_clip: Optional[float] = None,
    weight_decay: Optional[float] = None,
    moment_dtype: Optional[Any] = None,
) -> optax.GradientTransformation:
    """Optimizer dispatch matching train_temporal.py:131-135 defaults.

    moment_dtype=jnp.bfloat16 stores the FIRST moment in bf16
    (accumulation stays f32; the second moment must stay f32 — b2=0.999's
    0.1%/step decay is below bf16's ULP near 1, so a bf16 nu would freeze;
    see _moment_init): a 25% cut of optimizer-state HBM (-2 GB at DPOT-H)
    and of the HBM-roofline-bound optimizer pass's moment traffic. Off by
    default: f32 moments are the reference-exact configuration."""
    if name == "adam":
        tx = adam(
            learning_rate, beta1, beta2,
            weight_decay=1e-6 if weight_decay is None else weight_decay,
            clip_norm=grad_clip, moment_dtype=moment_dtype,
        )
    elif name == "adamw":
        tx = adamw(
            learning_rate, beta1, beta2,
            weight_decay=1e-2 if weight_decay is None else weight_decay,
            clip_norm=grad_clip, moment_dtype=moment_dtype,
        )
    elif name == "lamb":
        tx = lamb(
            learning_rate, beta1, beta2,
            weight_decay=1e-4 if weight_decay is None else weight_decay,
            clip_norm=grad_clip, moment_dtype=moment_dtype,
        )
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    return tx
