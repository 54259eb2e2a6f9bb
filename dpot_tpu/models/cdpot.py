"""CDPOTNet — the CNO-hybrid DPOT variant with anti-aliased resampling.

Capability parity with reference models/dpot_res.py:393-603 (CDPOTNet),
:326-357 (CNOPatchEmbed), :27-138 (CNOBlock). Same trunk as DPOTNet;
differences:
- patch embed uses the filtered activation LReLu_torch (up x2 antialiased
  -> LeakyReLU -> down, + bias) between the strided conv and the 1x1 conv,
- the output head starts with a CNOBlock (frequency low-pass [identity at
  conv_kernel=1] -> conv -> filtered activation upsampling latent -> img
  resolution) instead of a transpose conv.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from dpot_tpu.ops.activations import get_activation
from dpot_tpu.ops.initializers import torch_bias, torch_linear_weight, trunc_normal
from dpot_tpu.ops.norms import instance_stats
from dpot_tpu.ops.resample import low_pass_filter, lrelu_filtered
from dpot_tpu.models.dpot import Block, PatchConv, TimeAggregator

Dtype = Any


class CNOPatchEmbed(nn.Module):
    """Reference CNOPatchEmbed (models/dpot_res.py:326-357).

    Takes the RAW (B, H, W, T, C) input: proj1 is the PatchConv
    space-to-depth matmul lowering with the (x, y, t) grid channels
    folded in at latent resolution (models/dpot.py PatchConv — one
    well-tiled matmul instead of a tiny-channel strided conv plus a
    full-resolution grid materialization + transpose; same proj1
    parameter names/shapes, checkpoints unchanged). The per-frame
    (B*T, h, h, E) layout the filtered activation needs is formed AFTER
    patchification, where the transpose is p^2 x cheaper."""

    patch_size: int
    embed_dim: int
    out_dim: int
    latent_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, T, C) raw, grid folded in proj1
        B, _, _, T, _ = x.shape
        h = self.latent_size
        x = PatchConv(
            features=self.embed_dim, patch_size=self.patch_size,
            dtype=self.dtype, append_grid=True, name="proj1",
        )(x)  # (B, h, h, T, E)
        x = jnp.transpose(x, (0, 3, 1, 2, 4)).reshape(
            B * T, h, h, self.embed_dim
        )
        act_bias = self.param(
            "act_bias", nn.initializers.zeros, (self.embed_dim,)
        )
        x = lrelu_filtered(x, act_bias, in_size=self.latent_size)
        x = nn.Conv(
            self.out_dim, kernel_size=(1, 1),
            kernel_init=torch_linear_weight(), bias_init=torch_bias(self.embed_dim),
            dtype=self.dtype, name="proj2",
        )(x)
        return x


class CNOBlock(nn.Module):
    """Reference CNOBlock (models/dpot_res.py:27-138): low-pass filter ->
    conv -> filtered activation resampling in_size -> out_size."""

    out_channels: int
    in_size: int
    out_size: int
    conv_kernel: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        c_in = x.shape[-1]
        x = low_pass_filter(x, self.conv_kernel)
        x = nn.Conv(
            self.out_channels, kernel_size=(self.conv_kernel,) * 2,
            padding="SAME", kernel_init=torch_linear_weight(),
            bias_init=torch_bias(c_in * self.conv_kernel**2),
            dtype=self.dtype, name="convolution",
        )(x)
        act_bias = self.param(
            "act_bias", nn.initializers.zeros, (self.out_channels,)
        )
        return lrelu_filtered(
            x, act_bias, in_size=self.in_size, out_size=self.out_size
        )


class CDPOTNet(nn.Module):
    """Reference CDPOTNet (models/dpot_res.py:393-603). Same forward
    contract as DPOTNet: (B, X, Y, T, C) -> (pred, cls_logits)."""

    img_size: int = 224
    patch_size: int = 16
    in_channels: int = 1
    out_channels: int = 4
    in_timesteps: int = 1
    out_timesteps: int = 1
    n_blocks: int = 4
    embed_dim: int = 768
    out_layer_dim: int = 32
    depth: int = 12
    modes: int = 32
    mlp_ratio: float = 1.0
    n_cls: int = 12
    normalize: bool = False
    act: str = "gelu"
    time_agg: str = "exp_mlp"
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x):  # (B, X, Y, T, C)
        B, H, W, T, C = x.shape
        assert H == self.img_size and W == self.img_size
        act = get_activation(self.act)
        p = self.patch_size
        h = H // p

        if self.normalize:
            mu, sigma = instance_stats(x, axes=(1, 2, 3))
            x = (x - mu) / sigma
            stats = jnp.concatenate([mu, sigma], axis=-1)[:, 0, 0, 0, :]
            scale_mu = nn.Dense(
                self.embed_dim, kernel_init=torch_linear_weight(),
                bias_init=torch_bias(2 * self.in_channels), name="scale_feats_mu",
            )(stats)[:, None, None, :]
            scale_sigma = nn.Dense(
                self.embed_dim, kernel_init=torch_linear_weight(),
                bias_init=torch_bias(2 * self.in_channels), name="scale_feats_sigma",
            )(stats)[:, None, None, :]

        # grid channels fold into the patch matmul at latent resolution
        # (PatchConv append_grid inside CNOPatchEmbed — no (B,H,W,T,3)
        # materialization, no full-resolution transpose)
        x = CNOPatchEmbed(
            patch_size=p, embed_dim=self.out_channels * p + 3,
            out_dim=self.embed_dim, latent_size=h, dtype=self.dtype,
            name="patch_embed",
        )(x)

        pos_embed = self.param(
            "pos_embed", trunc_normal(0.02), (1, h, h, self.embed_dim)
        )
        x = x + pos_embed
        x = x.reshape(B, T, h, h, self.embed_dim).transpose(0, 2, 3, 1, 4)
        x = TimeAggregator(
            n_timesteps=self.in_timesteps, out_channels=self.embed_dim,
            time_agg=self.time_agg, dtype=self.dtype, name="time_agg",
        )(x)

        if self.normalize:
            x = scale_sigma * x + scale_mu

        block = nn.remat(Block) if self.remat else Block
        for i in range(self.depth):
            x = block(
                width=self.embed_dim, num_blocks=self.n_blocks,
                modes=self.modes, mlp_ratio=self.mlp_ratio, double_skip=False,
                act=self.act, dtype=self.dtype, name=f"blocks_{i}",
            )(x)

        cls_token = jnp.mean(x, axis=(1, 2))
        ct = cls_token
        for j, feats in enumerate([self.embed_dim, self.embed_dim, self.n_cls]):
            ct = nn.Dense(
                feats, kernel_init=torch_linear_weight(),
                bias_init=torch_bias(self.embed_dim), name=f"cls_head_{j}",
            )(ct)
            if j < 2:
                ct = act(ct)

        # CNO output head (models/dpot_res.py:481-489)
        x = CNOBlock(
            out_channels=self.out_layer_dim, in_size=h, out_size=H,
            conv_kernel=1, dtype=self.dtype, name="out_cno",
        )(x)
        x = nn.Conv(
            self.out_layer_dim, kernel_size=(1, 1),
            kernel_init=torch_linear_weight(), bias_init=torch_bias(self.out_layer_dim),
            dtype=self.dtype, name="out_conv1",
        )(x)
        x = act(x)
        x = nn.Conv(
            self.out_channels * self.out_timesteps, kernel_size=(1, 1),
            kernel_init=torch_linear_weight(), bias_init=torch_bias(self.out_layer_dim),
            dtype=self.dtype, name="out_conv2",
        )(x)
        x = x.reshape(B, H, W, self.out_timesteps, self.out_channels)

        if self.normalize:
            x = x * sigma + mu
        return x.astype(jnp.float32), ct.astype(jnp.float32)
