"""DPOTNet3D — 3D Denoising Operator Transformer, channels-last TPU layout.

Capability parity with reference models/dpot3d.py:228-407 (DPOTNet3D),
:180-226 (Block/PatchEmbed 3D), :22-97 (AFNO3D). Forward contract:
  input  (B, X, Y, Z, T_in, C_in)
  output (B, X, Y, Z, T_out, C_out)   — pred only, no cls output
  (reference models/dpot3d.py:354-390; the cls_head exists as a parameter
  but is not returned, matching :390).

The AFNO3D mixer keeps [:modes, :modes, :temporal_modes] of the rfftn
half-spectrum; temporal_modes is fixed at 8 in the reference Block
(models/dpot3d.py:182 constructs AFNO3D without passing it).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from dpot_tpu.ops.activations import get_activation
from dpot_tpu.ops.initializers import (
    scaled_uniform,
    torch_bias,
    torch_linear_weight,
    trunc_normal,
)
from dpot_tpu.ops.norms import instance_stats
from dpot_tpu.ops.spectral import afno_filter_3d
from dpot_tpu.models.dpot import GroupNorm, TimeAggregator

Dtype = Any


class AFNO3D(nn.Module):
    width: int
    num_blocks: int = 8
    modes: int = 32
    temporal_modes: int = 8
    act: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, X, Y, Z, C)
        nb = self.num_blocks
        bs = self.width // nb
        assert self.width % nb == 0
        scale = 1.0 / (bs * bs)
        w1 = self.param("w1", scaled_uniform(scale), (2, nb, bs, bs))
        b1 = self.param("b1", scaled_uniform(scale), (2, nb, bs))
        w2 = self.param("w2", scaled_uniform(scale), (2, nb, bs, bs))
        b2 = self.param("b2", scaled_uniform(scale), (2, nb, bs))
        # the reference AFNO3D hardcodes F.gelu inside the spectral mode
        # MLP regardless of the configured act (models/dpot3d.py:63-74 —
        # unlike 2D, where act is threaded through); parity requires the
        # same here, whatever self.act says
        return afno_filter_3d(
            x, w1, b1, w2, b2, self.modes, self.temporal_modes,
            get_activation("gelu"), compute_dtype=self.dtype,
        )


class Block3D(nn.Module):
    width: int
    num_blocks: int = 8
    modes: int = 32
    temporal_modes: int = 8
    mlp_ratio: float = 1.0
    double_skip: bool = False
    act: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.act)
        hidden = int(self.width * self.mlp_ratio)
        residual = x
        x = GroupNorm(name="norm1")(x)
        x = AFNO3D(
            width=self.width, num_blocks=self.num_blocks, modes=self.modes,
            temporal_modes=self.temporal_modes, act=self.act,
            dtype=self.dtype, name="filter",
        )(x)
        if self.double_skip:
            x = x + residual
            residual = x
        x = GroupNorm(name="norm2")(x)
        x = nn.Dense(
            hidden, kernel_init=torch_linear_weight(),
            bias_init=torch_bias(self.width), dtype=self.dtype, name="mlp_fc1",
        )(x)
        x = act(x)
        x = nn.Dense(
            self.width, kernel_init=torch_linear_weight(),
            bias_init=torch_bias(hidden), dtype=self.dtype, name="mlp_fc2",
        )(x)
        return x + residual


def _grid_patches_3d(H: int, W: int, L: int, T: int, p: int, dtype):
    """Patchified (x, y, z, t) grid channels (reference get_grid_4d,
    models/dpot3d.py:338-350) at latent resolution: (h, w, l, T, p^3*4),
    flattened in PatchConv3D's (a, b, c, channel) space-to-depth order."""
    h, w, l = H // p, W // p, L // p
    gx = jnp.linspace(0, 1, H, dtype=jnp.float32).reshape(h, p)
    gy = jnp.linspace(0, 1, W, dtype=jnp.float32).reshape(w, p)
    gz = jnp.linspace(0, 1, L, dtype=jnp.float32).reshape(l, p)
    gt = jnp.linspace(0, 1, T, dtype=jnp.float32)
    shape = (h, w, l, T, p, p, p)
    g = jnp.stack(
        [
            jnp.broadcast_to(gx[:, None, None, None, :, None, None], shape),
            jnp.broadcast_to(gy[None, :, None, None, None, :, None], shape),
            jnp.broadcast_to(gz[None, None, :, None, None, None, :], shape),
            jnp.broadcast_to(gt[None, None, None, :, None, None, None], shape),
        ],
        axis=-1,
    )  # (h, w, l, T, p, p, p, 4)
    return g.reshape(h, w, l, T, p**3 * 4).astype(dtype)


class PatchConv3D(nn.Module):
    """Conv3d(k=p, s=p) as space-to-depth + matmul (see 2D PatchConv for
    rationale; the win is larger in 3D where XLA's Conv3d lowering is
    weaker). Kernel layout (p,p,p,C,E) matches nn.Conv. Accepts
    (N, X, Y, Z, C) or (B, X, Y, Z, T, C) with T riding along.

    append_grid folds the reference's (x,y,z,t) grid-channel concat
    (models/dpot3d.py:354) into the patch matmul — the grid term is
    batch-independent, so it is evaluated once at latent resolution
    instead of materializing (B, X, Y, Z, T, 4) at 64^3 full resolution
    (same parameters, same output; see 2D PatchConv.append_grid)."""

    features: int
    patch_size: int
    dtype: Dtype = jnp.float32
    append_grid: bool = False

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        has_t = x.ndim == 6
        if has_t:
            B, H, W, L, T, C = x.shape
        else:
            B, H, W, L, C = x.shape
        g = 4 if self.append_grid else 0
        kernel = self.param(
            "kernel", torch_linear_weight(), (p, p, p, C + g, self.features)
        )
        bias = self.param("bias", torch_bias((C + g) * p**3), (self.features,))
        h, w, l = H // p, W // p, L // p
        k = (
            kernel[:, :, :, :C, :].reshape(p**3 * C, self.features)
            if g
            else kernel.reshape(p**3 * C, self.features)
        ).astype(self.dtype)
        x = x.astype(self.dtype)
        if has_t:
            x = x.reshape(B, h, p, w, p, l, p, T, C)
            x = jnp.transpose(x, (0, 1, 3, 5, 7, 2, 4, 6, 8))
            y = x.reshape(B, h, w, l, T, p**3 * C) @ k
        else:
            x = x.reshape(B, h, p, w, p, l, p, C)
            x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7))
            y = x.reshape(B, h, w, l, p**3 * C) @ k
        if g:
            assert has_t, "append_grid requires the (B,X,Y,Z,T,C) layout"
            k_grid = (
                kernel[:, :, :, C:, :]
                .reshape(p**3 * 4, self.features)
                .astype(self.dtype)
            )
            y = y + _grid_patches_3d(H, W, L, T, p, self.dtype) @ k_grid
        return y + bias.astype(self.dtype)


class UnpatchConv3D(nn.Module):
    """ConvTranspose3d(k=p, s=p) as matmul + depth-to-space; kernel layout
    (p,p,p,D,O)."""

    features: int
    patch_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, h, w, l, D)
        p = self.patch_size
        B, h, w, l, D = x.shape
        # torch ConvTranspose3d fan_in = weight.size(1)*k^3 = OUT*p^3 for
        # both kernel and bias (same quirk as the 2D UnpatchConv)
        kernel = self.param(
            "kernel", torch_linear_weight(fan_in=self.features * p**3),
            (p, p, p, D, self.features),
        )
        bias = self.param(
            "bias", torch_bias(self.features * p**3), (self.features,)
        )
        k = (
            jnp.transpose(kernel, (3, 0, 1, 2, 4))
            .reshape(D, p**3 * self.features)
            .astype(self.dtype)
        )
        y = x.astype(self.dtype) @ k
        y = y.reshape(B, h, w, l, p, p, p, self.features)
        y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6, 7))
        y = y.reshape(B, h * p, w * p, l * p, self.features)
        return y + bias.astype(self.dtype)


class PatchEmbed3D(nn.Module):
    patch_size: int
    embed_dim: int
    out_dim: int
    act: str = "gelu"
    dtype: Dtype = jnp.float32

    append_grid: bool = False

    @nn.compact
    def __call__(self, x):  # (..., X, Y, Z, C_in)
        x = PatchConv3D(
            self.embed_dim, self.patch_size, dtype=self.dtype,
            append_grid=self.append_grid, name="proj1",
        )(x)
        x = get_activation(self.act)(x)
        x = nn.Dense(
            self.out_dim, kernel_init=torch_linear_weight(),
            bias_init=torch_bias(self.embed_dim), dtype=self.dtype,
            name="proj2",
        )(x)
        return x


class DPOTNet3D(nn.Module):
    img_size: int = 64
    patch_size: int = 8
    in_channels: int = 1
    out_channels: int = 4
    in_timesteps: int = 1
    out_timesteps: int = 1
    n_blocks: int = 4
    embed_dim: int = 768
    out_layer_dim: int = 32
    depth: int = 12
    modes: int = 32
    temporal_modes: int = 8
    mlp_ratio: float = 1.0
    n_cls: int = 1
    normalize: bool = False
    act: str = "gelu"
    time_agg: str = "exp_mlp"
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x):  # (B, X, Y, Z, T, C)
        B, H, W, L, T, C = x.shape
        assert H == self.img_size and W == self.img_size and L == self.img_size
        act = get_activation(self.act)
        p = self.patch_size
        hl = H // p

        if self.normalize:
            mu, sigma = instance_stats(x, axes=(1, 2, 3, 4))  # (B,1,1,1,1,C)
            x = (x - mu) / sigma
            stats = jnp.concatenate([mu, sigma], axis=-1)[:, 0, 0, 0, 0, :]
            scale_mu = nn.Dense(
                self.embed_dim, kernel_init=torch_linear_weight(),
                bias_init=torch_bias(2 * self.in_channels), name="scale_feats_mu",
            )(stats)[:, None, None, None, :]
            scale_sigma = nn.Dense(
                self.embed_dim, kernel_init=torch_linear_weight(),
                bias_init=torch_bias(2 * self.in_channels), name="scale_feats_sigma",
            )(stats)[:, None, None, None, :]

        # 4D coordinate grid (x,y,z,t) — reference get_grid_4d
        # (models/dpot3d.py:338-350) — folded into the patch matmul
        # (PatchConv3D.append_grid) instead of materialized at 64^3.
        x = PatchEmbed3D(
            patch_size=p, embed_dim=self.out_channels * p + 4,
            out_dim=self.embed_dim, act=self.act, dtype=self.dtype,
            append_grid=True, name="patch_embed",
        )(x)  # (B, h, h, h, T, D)

        pos_embed = self.param(
            "pos_embed", trunc_normal(0.02), (1, hl, hl, hl, self.embed_dim)
        )
        x = x + pos_embed[:, :, :, :, None, :]

        x = TimeAggregator(
            n_timesteps=self.in_timesteps, out_channels=self.embed_dim,
            time_agg=self.time_agg, dtype=self.dtype, name="time_agg",
        )(x)  # (B, h, h, h, D)

        if self.normalize:
            x = (
                scale_sigma.astype(self.dtype) * x
                + scale_mu.astype(self.dtype)
            )  # AdaIN (cast: keep the residual stream in compute dtype)

        block = Block3D
        if self.remat:
            block = nn.remat(Block3D)
        for i in range(self.depth):
            x = block(
                width=self.embed_dim, num_blocks=self.n_blocks,
                modes=self.modes, temporal_modes=self.temporal_modes,
                mlp_ratio=self.mlp_ratio, double_skip=False, act=self.act,
                dtype=self.dtype, name=f"blocks_{i}",
            )(x)

        # cls_head exists for checkpoint parity but is not an output
        # (reference models/dpot3d.py:289-295,390)
        ct = jnp.mean(x, axis=(1, 2, 3))
        for j, feats in enumerate([self.embed_dim, self.embed_dim, self.n_cls]):
            ct = nn.Dense(
                feats, kernel_init=torch_linear_weight(),
                bias_init=torch_bias(self.embed_dim), name=f"cls_head_{j}",
            )(ct)
            if j < 2:
                ct = act(ct)

        x = UnpatchConv3D(
            self.out_layer_dim, p, dtype=self.dtype, name="out_deconv"
        )(x)
        x = act(x)
        x = nn.Dense(
            self.out_layer_dim,
            kernel_init=torch_linear_weight(), bias_init=torch_bias(self.out_layer_dim),
            dtype=self.dtype, name="out_conv1",
        )(x)
        x = act(x)
        x = nn.Dense(
            self.out_channels * self.out_timesteps,
            kernel_init=torch_linear_weight(), bias_init=torch_bias(self.out_layer_dim),
            dtype=self.dtype, name="out_conv2",
        )(x)

        x = x.reshape(B, H, W, L, self.out_timesteps, self.out_channels)
        if self.normalize:
            x = x * sigma + mu
        return x.astype(jnp.float32)
