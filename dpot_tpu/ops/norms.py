"""Normalization ops, channels-last.

group_norm matches torch.nn.GroupNorm(num_groups, C) semantics (as used by
the reference transformer blocks, models/dpot.py:142,152): statistics over
(spatial..., channels-within-group), per-channel affine, eps 1e-5.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def group_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int,
    eps: float = 1e-5,
) -> jax.Array:
    """x: (B, ..., C) channels-last; scale/bias: (C,)."""
    orig_dtype = x.dtype
    B = x.shape[0]
    C = x.shape[-1]
    spatial = x.shape[1:-1]
    g = num_groups
    xg = x.astype(jnp.float32).reshape(B, -1, g, C // g)  # (B, S, g, C/g)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 3), keepdims=True)
    xn = (xg - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(B, *spatial, C)
    return (xn * scale + bias).astype(orig_dtype)


def instance_stats(
    x: jax.Array, axes: tuple[int, ...], eps: float = 1e-6, ddof: int = 1
) -> tuple[jax.Array, jax.Array]:
    """Per-sample mean/std over `axes` (keepdims). Matches the reference's
    reversible instance norm (models/dpot.py:367: torch .std() is the
    unbiased estimator, hence ddof=1; +1e-6 applied by the caller there —
    we fold it into sigma here)."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=axes, keepdims=True)
    n = 1
    for a in axes:
        n *= x.shape[a]
    var = jnp.sum(jnp.square(x32 - mu), axis=axes, keepdims=True) / max(n - ddof, 1)
    sigma = jnp.sqrt(var) + eps
    return mu, sigma
