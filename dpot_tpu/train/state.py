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
