"""FNO baselines (2D/3D), channels-last TPU layout.

Capability parity with reference models/fno.py: SpectralConv2d_fast (:14-55),
FNO2d (:85-283), SpectralConv3d (:290-343), FNO3d (:346-435).

TPU design notes:
- Spectral conv weights are stored real-stacked (2, in, out, modes...) —
  the layout the reference itself uses for 2D (models/fno.py:28-29). The
  reference's 3D variant uses torch cfloat (:305-316); here 3D uses the
  same real-stacked layout so every tensor stays on the well-supported
  real path (the tunneled TPU backend has no complex support); the
  checkpoint converter splits cfloat into the stacked layout.
- FFTs use the pair API (matmul-DFT on TPU). FNO's rfft2 uses the torch
  default 'backward' norm — different from AFNO's 'ortho' — preserved here.
- The per-mode complex contraction 'bxyi,ioxy->bxyo' is einsum'd directly;
  XLA maps it onto the MXU as batched matmuls over modes.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from dpot_tpu.ops.activations import get_activation
from dpot_tpu.ops.fourier import (
    irfft2_pair,
    irfft3_pair,
    rfft2_pair,
    rfft3_pair,
)
from dpot_tpu.ops.initializers import (
    scaled_uniform,
    torch_bias,
    torch_linear_weight,
)
from dpot_tpu.ops.norms import instance_stats
from dpot_tpu.models.dpot import GroupNorm, PatchEmbed

Dtype = Any


def _cmul(xr, xi, wr, wi, eq):
    """Complex contraction on (re, im) pairs."""
    yr = jnp.einsum(eq, xr, wr) - jnp.einsum(eq, xi, wi)
    yi = jnp.einsum(eq, xr, wi) + jnp.einsum(eq, xi, wr)
    return yr, yi


class SpectralConv2d(nn.Module):
    """Reference SpectralConv2d_fast (models/fno.py:14-55), channels-last:
    keeps the +-modes1 x modes2 corners of the half-spectrum."""

    in_channels: int
    out_channels: int
    modes1: int
    modes2: int

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        B, H, W, C = x.shape
        m1, m2 = self.modes1, self.modes2
        scale = 1.0 / (self.in_channels * self.out_channels)
        w1 = self.param(
            "weights1", scaled_uniform(scale),
            (2, self.in_channels, self.out_channels, m1, m2),
        )
        w2 = self.param(
            "weights2", scaled_uniform(scale),
            (2, self.in_channels, self.out_channels, m1, m2),
        )
        x32 = x.astype(jnp.float32)
        fr, fi = rfft2_pair(x32, axes=(1, 2), norm="backward")
        eq = "bxyi,ioxy->bxyo"
        tr, ti = _cmul(fr[:, :m1, :m2], fi[:, :m1, :m2], w1[0], w1[1], eq)
        br, bi = _cmul(fr[:, H - m1 :, :m2], fi[:, H - m1 :, :m2], w2[0], w2[1], eq)

        Wf = W // 2 + 1
        o = self.out_channels

        def scatter(top, bot):
            z = jnp.zeros((B, H, Wf, o), jnp.float32)
            z = z.at[:, :m1, :m2].set(top)
            z = z.at[:, H - m1 :, :m2].set(bot)
            return z

        y = irfft2_pair(
            scatter(tr, br), scatter(ti, bi), s=(H, W), axes=(1, 2),
            norm="backward",
        )
        return y.astype(x.dtype)


class FNO2d(nn.Module):
    """Reference FNO2d (models/fno.py:85-283). Forward:
    (B, X, Y, T, C) -> ((B, X, Y, T_out, C), cls_logits)."""

    modes1: int
    modes2: int
    width: int
    img_size: int = 64
    n_channels: int = 1
    in_timesteps: int = 10
    out_timesteps: int = 1
    n_layers: int = 4
    patch_size: int = 1
    use_ln: bool = False
    normalize: bool = False
    n_cls: int = 0
    act: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, T, C = x.shape
        act = get_activation(self.act)  # default gelu == reference
        if self.normalize:
            mu, sigma = instance_stats(x, axes=(1, 2, 3))
            x = (x - mu) / sigma
            stats = jnp.concatenate([mu, sigma], axis=-1)[:, 0, 0, 0, :]
            scale_feats = nn.Dense(
                self.width, kernel_init=torch_linear_weight(),
                bias_init=torch_bias(2 * self.n_channels), name="scale_feats",
            )(stats)[:, None, None, :]
        else:
            scale_feats = 0.0

        x = x.reshape(B, H, W, T * C)
        gx = jnp.broadcast_to(
            jnp.linspace(0, 1, H, dtype=x.dtype)[None, :, None, None], (B, H, W, 1)
        )
        gy = jnp.broadcast_to(
            jnp.linspace(0, 1, W, dtype=x.dtype)[None, None, :, None], (B, H, W, 1)
        )
        x = jnp.concatenate([x, gx, gy], axis=-1)  # (B, H, W, T*C+2)

        x = PatchEmbed(
            patch_size=self.patch_size,
            embed_dim=T * C * self.patch_size + 2,
            out_dim=self.width,
            act="gelu",
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        x = x + scale_feats

        for i in range(self.n_layers):
            x1 = SpectralConv2d(
                self.width, self.width, self.modes1, self.modes2,
                name=f"spectral_{i}",
            )(x)
            x2 = nn.Dense(
                self.width, kernel_init=torch_linear_weight(),
                bias_init=torch_bias(self.width), dtype=self.dtype,
                name=f"w_{i}",
            )(x)
            x = act(x1 + x2)
            if self.use_ln:
                x = GroupNorm(num_groups=4, name=f"ln_{i}")(x)

        cls_token = jnp.mean(x, axis=(1, 2))
        ct = cls_token
        for j, feats in enumerate([self.width, self.width, self.n_cls]):
            ct = nn.Dense(
                feats, kernel_init=torch_linear_weight(),
                bias_init=torch_bias(self.width), name=f"cls_head_{j}",
            )(ct)
            if j < 2:
                ct = act(ct)

        x = nn.Dense(
            self.width, kernel_init=torch_linear_weight(),
            bias_init=torch_bias(self.width), dtype=self.dtype, name="fc1",
        )(x)
        x = act(x)
        x = nn.Dense(
            self.n_channels * self.out_timesteps,
            kernel_init=torch_linear_weight(), bias_init=torch_bias(self.width),
            dtype=self.dtype, name="fc2",
        )(x)
        hp, wp = x.shape[1], x.shape[2]
        x = x.reshape(B, hp, wp, self.out_timesteps, C)
        if self.normalize:
            x = x * sigma + mu
        return x.astype(jnp.float32), ct.astype(jnp.float32)


class SpectralConv3d(nn.Module):
    """Reference SpectralConv3d (models/fno.py:290-343) with real-stacked
    weights (4 corner blocks over +-m1, +-m2, :m3)."""

    in_channels: int
    out_channels: int
    modes1: int
    modes2: int
    modes3: int

    @nn.compact
    def __call__(self, x):  # (B, X, Y, Z, C)
        B, H, W, L, C = x.shape
        m1, m2, m3 = self.modes1, self.modes2, self.modes3
        scale = 1.0 / (self.in_channels * self.out_channels)
        ws = [
            self.param(
                f"weights{k+1}", scaled_uniform(scale),
                (2, self.in_channels, self.out_channels, m1, m2, m3),
            )
            for k in range(4)
        ]
        x32 = x.astype(jnp.float32)
        fr, fi = rfft3_pair(x32, axes=(1, 2, 3), norm="backward")
        eq = "bxyzi,ioxyz->bxyzo"
        corners = [
            (slice(0, m1), slice(0, m2)),
            (slice(H - m1, H), slice(0, m2)),
            (slice(0, m1), slice(W - m2, W)),
            (slice(H - m1, H), slice(W - m2, W)),
        ]
        Lf = L // 2 + 1
        o = self.out_channels
        zr = jnp.zeros((B, H, W, Lf, o), jnp.float32)
        zi = jnp.zeros((B, H, W, Lf, o), jnp.float32)
        for w, (sx, sy) in zip(ws, corners):
            cr, ci = _cmul(
                fr[:, sx, sy, :m3], fi[:, sx, sy, :m3], w[0], w[1], eq
            )
            zr = zr.at[:, sx, sy, :m3].set(cr)
            zi = zi.at[:, sx, sy, :m3].set(ci)
        y = irfft3_pair(zr, zi, s=(H, W, L), axes=(1, 2, 3), norm="backward")
        return y.astype(x.dtype)


class FNO3d(nn.Module):
    """Reference FNO3d (models/fno.py:346-435). Forward:
    (B, X, Y, Z, T, C) -> (B, X, Y, Z, T_out, C) (no cls output)."""

    modes1: int
    modes2: int
    modes3: int
    width: int
    img_size: int = 64
    n_channels: int = 1
    in_timesteps: int = 10
    out_timesteps: int = 1
    n_layers: int = 4
    use_ln: bool = False
    normalize: bool = False
    n_cls: int = 0
    act: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, L, T, C = x.shape
        act = get_activation(self.act)  # default gelu == reference
        x = x.reshape(B, H, W, L, T * C)

        def axgrid(n, axis):
            shape = [1] * 5
            shape[axis] = n
            return jnp.broadcast_to(
                jnp.linspace(0, 1, n, dtype=x.dtype).reshape(shape),
                (B, H, W, L, 1),
            )

        x = jnp.concatenate(
            [x, axgrid(H, 1), axgrid(W, 2), axgrid(L, 3)], axis=-1
        )
        x = nn.Dense(
            self.width, kernel_init=torch_linear_weight(),
            bias_init=torch_bias(T * C + 3), dtype=self.dtype, name="fc0",
        )(x)

        for i in range(self.n_layers):
            x1 = SpectralConv3d(
                self.width, self.width, self.modes1, self.modes2, self.modes3,
                name=f"spectral_{i}",
            )(x)
            x2 = nn.Dense(
                self.width, kernel_init=torch_linear_weight(),
                bias_init=torch_bias(self.width), dtype=self.dtype,
                name=f"w_{i}",
            )(x)
            x = act(x1 + x2)
            if self.use_ln:
                x = GroupNorm(num_groups=4, name=f"ln_{i}")(x)

        x = nn.Dense(
            self.width, kernel_init=torch_linear_weight(),
            bias_init=torch_bias(self.width), dtype=self.dtype, name="fc1",
        )(x)
        x = act(x)
        x = nn.Dense(
            self.n_channels * self.out_timesteps,
            kernel_init=torch_linear_weight(), bias_init=torch_bias(self.width),
            dtype=self.dtype, name="fc2",
        )(x)
        x = x.reshape(B, H, W, L, self.out_timesteps, C)
        return x.astype(jnp.float32)
