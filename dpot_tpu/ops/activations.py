"""Activation registry.

Mirrors the activation surface of the reference (models/dpot.py:19
ACTIVATION dict) as plain jax functions. `gelu` is exact (erf-based) to match
torch.nn.GELU's default, which matters for checkpoint-interop parity.

Precision-aware gelu: under bf16 compute the tanh approximation is used.
Its error vs exact gelu (max ~1e-3 absolute near |x|~2) sits below bf16's
own resolution (eps ~3.9e-3), so bf16 activations are numerically
indistinguishable between the two — while XLA's exact erf costs an f32
upcast + a long polynomial on the VPU (measured 0.11 ms per DPOT-M block
fwd, ~1.3 ms/step across 12 blocks). All f32 paths (golden/parity tests,
checkpoint interop) keep the exact erf form.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Act = Callable[[jax.Array], jax.Array]


def _gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))


_ACTIVATIONS: dict[str, Act] = {
    "gelu": _gelu,
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
