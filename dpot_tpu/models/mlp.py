"""Residual MLP and Fourier-feature MLP (reference models/mlp.py:14-132).

Not used by the DPOT training paths (the reference keeps them as utility
models); provided for capability parity. The reference's DGL graph branch
(mlp.py:115-118) is dead code there (dgl is not a dependency) and is
omitted.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dpot_tpu.ops.activations import get_activation
from dpot_tpu.ops.initializers import scaled_normal, torch_bias, torch_linear_weight

Dtype = Any


class MLP(nn.Module):
    """Residual MLP (reference models/mlp.py:14-45)."""

    n_hidden: int
    n_output: int
    n_layers: int = 1
    act: str = "gelu"
    res: bool = True

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.act)
        n_in = x.shape[-1]
        x = act(
            nn.Dense(self.n_hidden, kernel_init=torch_linear_weight(),
                     bias_init=torch_bias(n_in), name="linear_pre")(x)
        )
        for i in range(self.n_layers):
            h = act(
                nn.Dense(self.n_hidden, kernel_init=torch_linear_weight(),
                         bias_init=torch_bias(self.n_hidden),
                         name=f"linears_{i}")(x)
            )
            x = h + x if self.res else h
        return nn.Dense(self.n_output, kernel_init=torch_linear_weight(),
                        bias_init=torch_bias(self.n_hidden),
                        name="linear_post")(x)


class FourierMLP(nn.Module):
    """Fourier-feature MLP (reference models/mlp.py:74-132): random
    Gaussian or exponential frequency features on the coordinates, a
    3-layer theta encoder, and a residual-MLP trunk."""

    space_dim: int = 2
    theta_dim: int = 1
    output_size: int = 3
    n_layers: int = 2
    n_hidden: int = 64
    act: str = "gelu"
    fourier_dim: int = 0
    feature_type: str = "gaussian"  # 'gaussian' | 'exp'
    sigma: float = 1.0
    res: bool = True

    @nn.compact
    def __call__(self, x, theta=None):
        if theta is None:
            theta = jnp.zeros((x.shape[0], self.theta_dim), x.dtype)
        if self.fourier_dim > 0:
            if self.feature_type == "gaussian":
                # drawn from the INIT rng (reference: sigma*torch.randn
                # per module) — a hardcoded seed would give every
                # FourierMLP instance/seeded run the identical features
                B = self.variable(
                    "constants", "B",
                    lambda: self.sigma * jax.random.normal(
                        self.make_rng("params"),
                        (self.space_dim, self.fourier_dim), jnp.float32,
                    ),
                ).value
                feats = 2 * jnp.pi * x @ jnp.asarray(B)
            elif self.feature_type == "exp":
                freqs = jnp.logspace(
                    np.log10(1 / 2048), np.log10(2048),
                    self.fourier_dim // self.space_dim,
                )
                feats = 2 * jnp.pi * jnp.einsum("ij,k->ijk", x, freqs).reshape(
                    x.shape[0], -1
                )
            else:
                raise ValueError(self.feature_type)
            theta_feats = MLP(
                self.fourier_dim, self.fourier_dim, n_layers=3, act=self.act,
                res=self.res, name="theta_mlp",
            )(theta)
            z = jnp.concatenate(
                [jnp.sin(feats), jnp.cos(feats), theta_feats], axis=-1
            )
        else:
            z = jnp.concatenate([x, theta], axis=-1)
        return MLP(
            self.n_hidden, self.output_size, n_layers=self.n_layers,
            act=self.act, res=self.res, name="mlp",
        )(z)
