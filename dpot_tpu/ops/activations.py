"""Activation registry.

Mirrors the activation surface of the reference (models/dpot.py:19
ACTIVATION dict) as plain jax functions. `gelu` is exact (erf-based) to match
torch.nn.GELU's default, which matters for checkpoint-interop parity.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Act = Callable[[jax.Array], jax.Array]

_ACTIVATIONS: dict[str, Act] = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "relu": jax.nn.relu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.1),
    "softplus": jax.nn.softplus,
    "ELU": jax.nn.elu,
    "elu": jax.nn.elu,
    "silu": jax.nn.silu,
}


def get_activation(name: str) -> Act:
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise ValueError(
            f"unknown activation {name!r}; available: {sorted(_ACTIVATIONS)}"
        ) from None
