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


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array
    rng: jax.Array
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Any = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, apply_fn, params, tx, rng):
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

        return cls(
            params=params,
            opt_state=tx.init(params),
            step=jnp.zeros([], jnp.int32),
            rng=rng,
            tx=tx,
            apply_fn=apply_fn,
        )

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            params=new_params, opt_state=new_opt_state, step=self.step + 1
        )
