"""Initializers matching the reference's (PyTorch-default) weight distributions.

The reference relies on torch defaults almost everywhere: Linear/Conv use
kaiming-uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
weight and bias. AFNO weights use `scale * U[0, 1)` with
scale = 1/(block_size^2 * factor) (reference models/dpot.py:41-48); the time
aggregator uses scaled normals (models/dpot.py:221-224). Matching the
*distributions* (not values) keeps from-scratch training comparable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.nn.initializers import Initializer


def torch_linear_weight(fan_in: int | None = None) -> Initializer:
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)), torch Linear/Conv default.

    If fan_in is None it is inferred from the param shape assuming flax
    layout: Dense kernels are (in, out); Conv kernels are (kh, kw, in, out)
    with fan_in = kh*kw*in.
    """

    def init(key, shape, dtype=jnp.float32):
        if fan_in is None:
            if len(shape) == 2:
                f = shape[0]
            else:
                f = int(np.prod(shape[:-1]))
        else:
            f = fan_in
        bound = 1.0 / np.sqrt(f)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias(fan_in: int) -> Initializer:
    """torch Linear/Conv bias default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def scaled_uniform(scale: float) -> Initializer:
    """scale * U[0, 1) — AFNO spectral-MLP init (reference models/dpot.py:45-48)."""

    def init(key, shape, dtype=jnp.float32):
        return scale * jax.random.uniform(key, shape, dtype)

    return init


def scaled_normal(scale: float) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        return scale * jax.random.normal(key, shape, dtype)

    return init


def trunc_normal(std: float = 0.02, a: float = -2.0, b: float = 2.0) -> Initializer:
    """torch.nn.init.trunc_normal_ semantics: a/b are ABSOLUTE cutoffs,
    not multiples of std. At the reference's std=0.02 the +-2 window is
    +-100 sigma — effectively an untruncated normal with exact std 0.02
    (truncating at +-2 SIGMA instead would shrink the std ~12% to
    0.88*std, a from-scratch init drift vs the reference)."""

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(
            key, a / std, b / std, shape, dtype
        )

    return init


def gamma_geometric() -> Initializer:
    """TimeAggregator gamma: 2**linspace(-10, 10, C) (reference models/dpot.py:224)."""

    def init(key, shape, dtype=jnp.float32):
        del key
        c = shape[-1]
        return jnp.broadcast_to(
            2.0 ** jnp.linspace(-10.0, 10.0, c, dtype=dtype), shape
        ).astype(dtype)

    return init
