"""Dimension-generic UNet baseline (1/2/3D), channels-last.

Capability parity with reference models/unet.py:372-564: 4-level
encoder/decoder with double-conv blocks (conv3-BN-act twice), max-pool 2,
transpose-conv upsampling with skip concats, right-padding every spatial
axis to a multiple of 16, coordinate-grid input channels (grid first, data
second — unet.py:474), 1x1 output conv, zeros cls output (unet.py:534).

BatchNorm matches torch.nn.BatchNorm2d (reference models/unet.py:235):
train mode normalizes with batch statistics and tracks running averages
(momentum 0.1, unbiased running var); eval mode normalizes with the
tracked running statistics. Running stats live in the 'batch_stats'
variable collection, which rides inside the same variables pytree the
rest of the framework already passes around; the generic train step
threads the mutated collection automatically (train/step.py).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dpot_tpu.ops.activations import get_activation
from dpot_tpu.ops.initializers import torch_bias, torch_linear_weight

Dtype = Any


class BatchNorm(nn.Module):
    """torch.nn.BatchNorm{1,2,3}d-compatible batch norm, channels-last.

    train=True: normalize with the biased batch statistics over
    (batch, spatial) and update running averages with torch's convention
    (new = (1-momentum)*old + momentum*batch, where the running var update
    uses the UNBIASED batch variance but normalization uses the biased
    one). train=False: normalize with the running statistics — the
    behavior the reference's eval path gets from nn.BatchNorm2d
    (reference models/unet.py:235)."""

    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        x32 = x.astype(jnp.float32)
        if train:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x32, axis=axes)
            var = jnp.mean(jnp.square(x32 - mean), axis=axes)
            if not self.is_initializing():
                n = float(np.prod([x.shape[a] for a in axes]))
                unbiased = var * (n / max(n - 1.0, 1.0))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * jax.lax.stop_gradient(mean)
                ra_var.value = (1 - m) * ra_var.value + m * jax.lax.stop_gradient(unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value
        xn = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (xn * scale + bias).astype(x.dtype)


class _DoubleConv(nn.Module):
    features: int
    n_dim: int
    act: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = get_activation(self.act)
        k = (3,) * self.n_dim
        for i in (1, 2):
            x = nn.Conv(
                self.features, kernel_size=k, padding="SAME", use_bias=False,
                kernel_init=torch_linear_weight(), dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            x = BatchNorm(name=f"norm{i}")(x, train=train)
            x = act(x)
        return x


def _maxpool(x, n_dim):
    return nn.max_pool(x, window_shape=(2,) * n_dim, strides=(2,) * n_dim)


class UNet(nn.Module):
    # in_channels is informational (the forward infers shapes from x and
    # folds time itself) but kept: callers construct UNet(in_channels=...)
    # symmetrically with the other families
    in_channels: int = 30
    out_channels: int = 1
    out_timesteps: int = 1
    width: int = 32
    n_dim: int = 2
    act: str = "gelu"
    n_cls: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, spatial..., T, C)
        n_dim = self.n_dim
        B = x.shape[0]
        spatial = x.shape[1:-2]
        T, C = x.shape[-2], x.shape[-1]
        act = get_activation(self.act)

        # fold time into channels + coordinate grid FIRST (unet.py:474)
        x = x.reshape(B, *spatial, T * C)
        grids = []
        for ax, n in enumerate(spatial):
            shape = [1] * (len(spatial) + 2)
            shape[ax + 1] = n
            grids.append(
                jnp.broadcast_to(
                    jnp.linspace(0, 1, n, dtype=x.dtype).reshape(shape),
                    (B, *spatial, 1),
                )
            )
        x = jnp.concatenate(grids + [x], axis=-1)

        # pad every spatial axis up to a multiple of 16 (unet.py:392,489-495)
        pads = [(0, 0)]
        for n in spatial:
            p = int(np.ceil(n / 16) * 16 - n)
            pads.append((0, p))
        pads.append((0, 0))
        x = jnp.pad(x, pads)

        f = self.width
        enc1 = _DoubleConv(f, n_dim, self.act, self.dtype, name="enc1")(
            x, train=train
        )
        enc2 = _DoubleConv(f * 2, n_dim, self.act, self.dtype, name="enc2")(
            _maxpool(enc1, n_dim), train=train
        )
        enc3 = _DoubleConv(f * 4, n_dim, self.act, self.dtype, name="enc3")(
            _maxpool(enc2, n_dim), train=train
        )
        enc4 = _DoubleConv(f * 8, n_dim, self.act, self.dtype, name="enc4")(
            _maxpool(enc3, n_dim), train=train
        )
        bott = _DoubleConv(f * 16, n_dim, self.act, self.dtype, name="bottleneck")(
            _maxpool(enc4, n_dim), train=train
        )

        def up(z, feats, name):
            # torch ConvTranspose computes fan_in from weight.size(1)*k^n
            # = OUT_channels*2^n for BOTH kernel and bias (the inferred
            # flax fan would be k^n*in = 2x that -> sqrt(2)-narrower init)
            return nn.ConvTranspose(
                feats, kernel_size=(2,) * n_dim, strides=(2,) * n_dim,
                padding="VALID",
                kernel_init=torch_linear_weight(fan_in=feats * 2**n_dim),
                bias_init=torch_bias(feats * 2**n_dim), dtype=self.dtype,
                name=name,
            )(z)

        d = up(bott, f * 8, "upconv4")
        d = _DoubleConv(f * 8, n_dim, self.act, self.dtype, name="dec4")(
            jnp.concatenate([d, enc4], axis=-1), train=train
        )
        d = up(d, f * 4, "upconv3")
        d = _DoubleConv(f * 4, n_dim, self.act, self.dtype, name="dec3")(
            jnp.concatenate([d, enc3], axis=-1), train=train
        )
        d = up(d, f * 2, "upconv2")
        d = _DoubleConv(f * 2, n_dim, self.act, self.dtype, name="dec2")(
            jnp.concatenate([d, enc2], axis=-1), train=train
        )
        d = up(d, f, "upconv1")
        d = _DoubleConv(f, n_dim, self.act, self.dtype, name="dec1")(
            jnp.concatenate([d, enc1], axis=-1), train=train
        )

        # crop the padding back off
        crop = tuple(
            slice(0, n) for n in spatial
        )
        d = d[(slice(None), *crop, slice(None))]

        out = nn.Conv(
            self.out_timesteps * self.out_channels, kernel_size=(1,) * n_dim,
            kernel_init=torch_linear_weight(), bias_init=torch_bias(f),
            dtype=self.dtype, name="out_conv",
        )(d)
        out = out.reshape(B, *spatial, self.out_timesteps, self.out_channels)
        cls = jnp.zeros((B, self.n_cls), jnp.float32)
        return out.astype(jnp.float32), cls
