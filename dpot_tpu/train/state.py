"""Train state: params + optimizer state + step + PRNG, as one pytree.

Improves on the reference checkpoint contract (train_temporal.py:287 saves
only model+optimizer; scheduler state and epoch are dropped) by carrying
everything needed for exact resume.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax


def training_key(seed: int) -> jax.Array:
    """PRNG key for the training loop's noise stream.

    On TPU the default threefry generator costs ~0.5-1 ms per DPOT-M step
    just to sample the injected noise (train_temporal.py:205); the
    hardware rbg generator samples the same distribution ~4x faster and is
    fully adequate for data noise (not for e.g. DP privacy noise). CPU/GPU
    keep threefry so tests are reproducible against recorded goldens.

    Platform-deterministic, so checkpoint resume on the same platform sees
    a consistent key layout.
    """
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    if platform in ("cpu", "gpu", "cuda", "rocm"):
        return jax.random.key(seed)
    return jax.random.key(seed, impl="rbg")


def cast_working_copy(params, dtype) -> Any:
    """Low-precision working copy of a param tree: real float leaves cast
    to `dtype`, everything else (complex spectral weights, int counters)
    untouched."""
    import jax.numpy as jnp

    def one(p):
        if hasattr(p, "dtype") and p.dtype in (jnp.float32, jnp.float64):
            return p.astype(dtype)
        return p

    return jax.tree.map(one, params)


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array
    rng: jax.Array
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Any = flax.struct.field(pytree_node=False)
    # Optional low-precision WORKING COPY of params (the bf16-params fast
    # path): fwd/bwd consume params_lp — the per-step f32 master read +
    # bf16 materialize (~0.7 GB of HBM traffic at DPOT-M) disappears from
    # the model pass, and the refresh cast fuses into the optimizer's
    # param write (which already has the new f32 values in registers).
    # None (default) = reference-exact f32 path. Gradients then arrive in
    # the working dtype; the optimizers upcast for all accumulation
    # arithmetic (_gacc/_abs_sq) but the wgrad rounding to bf16 is a real
    # (documented) numerics deviation — opt-in lever only.
    params_lp: Any = None

    @classmethod
    def create(cls, apply_fn, params, tx, rng, param_working_dtype=None):
        import jax.numpy as jnp

        if (
            isinstance(params, dict)
            and "params" in params
            and any(k != "params" for k in params)
        ):
            # variables tree carries non-parameter collections (UNet's
            # batch_stats running averages): mask them out of the optimizer
            # so no moments are allocated and no decay/trust-ratio math runs
            # on state that the train step overwrites anyway (train/step.py)
            mask = {
                k: jax.tree.map(lambda _: k == "params", v)
                for k, v in params.items()
            }
            tx = optax.masked(tx, mask)
            assert param_working_dtype is None, (
                "the low-precision working copy does not support models "
                "with non-parameter collections (batch_stats)"
            )

        return cls(
            params=params,
            opt_state=tx.init(params),
            step=jnp.zeros([], jnp.int32),
            rng=rng,
            tx=tx,
            apply_fn=apply_fn,
            params_lp=(
                cast_working_copy(params, param_working_dtype)
                if param_working_dtype is not None
                else None
            ),
        )

    @property
    def working_params(self):
        """The tree the forward/backward pass should consume."""
        return self.params if self.params_lp is None else self.params_lp

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_lp = None
        if self.params_lp is not None:
            import jax.numpy as jnp

            # the working dtype is whatever the f32 leaves were cast to
            # (complex/int leaves pass through cast_working_copy untouched,
            # so the first leaf is not necessarily representative)
            lp_dtype = next(
                (
                    l.dtype
                    for l in jax.tree.leaves(self.params_lp)
                    if l.dtype in (jnp.bfloat16, jnp.float16)
                ),
                jnp.bfloat16,
            )
            new_lp = cast_working_copy(new_params, lp_dtype)
        return self.replace(
            params=new_params, opt_state=new_opt_state, step=self.step + 1,
            params_lp=new_lp,
        )
