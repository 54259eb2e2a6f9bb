"""DPOTNet (2D) — Denoising Operator Transformer, TPU-native.

Capability parity with reference models/dpot.py:245-420 (DPOTNet),
:137-180 (Block), :183-209 (PatchEmbed), :213-234 (TimeAggregator),
:27-110 (AFNO2D). Everything here is channels-last (B, X, Y, T, C) at the
boundary and (B, H, W, C) in the trunk — the native TPU layout — whereas
the reference permutes to NCHW around every conv/norm.

Forward contract (reference models/dpot.py:364-403):
  input  (B, X, Y, T_in, C_in)
  output ((B, X, Y, T_out, C_out), cls_logits (B, n_cls))
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from dpot_tpu.ops.activations import get_activation
from dpot_tpu.ops.initializers import (
    gamma_geometric,
    scaled_normal,
    scaled_uniform,
    torch_bias,
    torch_linear_weight,
    trunc_normal,
)
from dpot_tpu.ops.norms import group_norm, instance_stats
from dpot_tpu.ops.spectral import afno_filter_2d

Dtype = Any


class GroupNorm(nn.Module):
    """torch.nn.GroupNorm-compatible group norm (channels-last)."""

    num_groups: int = 8
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, only_params: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if only_params:
            # fused-kernel path: the caller applies the norm inside a
            # Pallas kernel; this branch only declares/returns the params
            return scale, bias
        return group_norm(x, scale, bias, self.num_groups, self.epsilon)


class AFNO2D(nn.Module):
    """Adaptive FNO spectral mixer. Parameters laid out exactly as the
    reference (models/dpot.py:45-48) for checkpoint interop.

    spatial_mesh: when set (and its 'spatial' axis is >1), the mixer runs
    the pencil-decomposed distributed FFT (parallel/dist_fft.py) with the
    latent H axis sharded over that mesh axis — the sequence-parallel
    analogue that lets >128^2 native-resolution models exceed one chip
    (the reference instead downscales, griddataset.py:96)."""

    width: int
    num_blocks: int = 8
    modes: int = 32
    hidden_size_factor: int = 1
    act: str = "gelu"
    dtype: Dtype = jnp.float32
    spatial_mesh: Any = None
    spatial_axis: str = "spatial"
    pre_norm_groups: int = 8  # GroupNorm groups on the fused pre_norm path

    @nn.compact
    def __call__(self, x, pre_norm=None):  # (B, H, W, C)
        nb = self.num_blocks
        bs = self.width // nb
        f = self.hidden_size_factor
        assert self.width % nb == 0
        scale = 1.0 / (bs * bs * f)
        w1 = self.param("w1", scaled_uniform(scale), (2, nb, bs, bs * f))
        b1 = self.param("b1", scaled_uniform(scale), (2, nb, bs * f))
        w2 = self.param("w2", scaled_uniform(scale), (2, nb, bs * f, bs))
        b2 = self.param("b2", scaled_uniform(scale), (2, nb, bs))
        if pre_norm is not None:
            # fused GroupNorm+AFNO Pallas path (Block passes its norm1
            # params; bf16 compute, qualifying shapes only)
            from dpot_tpu.ops.pallas.afno_fused import fused_gn_afno
            from dpot_tpu.ops.spectral import (
                _combined_spectral_ops,
                _complex_as_real_weight,
            )

            B, H, W, C = x.shape
            kh = min(self.modes, H)
            kw = min(self.modes, W // 2 + 1)
            K = kh * kw
            A_np, Ai_np = _combined_spectral_ops(H, W, kh, kw)
            gs, gb = pre_norm
            out = fused_gn_afno(
                x.reshape(B, H * W, C).astype(jnp.bfloat16),
                gs.reshape(1, C).astype(jnp.float32),
                gb.reshape(1, C).astype(jnp.float32),
                jnp.asarray(A_np, jnp.bfloat16),
                jnp.asarray(Ai_np, jnp.bfloat16),
                _complex_as_real_weight(w1[0], w1[1]).astype(jnp.bfloat16),
                jnp.concatenate([b1[0], b1[1]], -1)[:, None, :].astype(
                    jnp.float32
                ),
                _complex_as_real_weight(w2[0], w2[1]).astype(jnp.bfloat16),
                jnp.concatenate([b2[0], b2[1]], -1)[:, None, :].astype(
                    jnp.float32
                ),
                K,
                self.pre_norm_groups,
            )
            return out.reshape(B, H, W, C)
        mesh = self.spatial_mesh
        if mesh is not None and mesh.shape.get(self.spatial_axis, 1) > 1:
            from dpot_tpu.parallel.dist_fft import afno_filter_2d_sharded

            # split B over 'data' too when it divides (dp x sp); otherwise
            # replicate the batch within each spatial group
            batch_axis = None
            if (
                "data" in mesh.axis_names
                and mesh.shape["data"] > 1
                and x.shape[0] % mesh.shape["data"] == 0
            ):
                batch_axis = "data"
            return afno_filter_2d_sharded(
                x, w1, b1, w2, b2, self.modes, get_activation(self.act),
                mesh=mesh, axis_name=self.spatial_axis,
                batch_axis=batch_axis,
                compute_dtype=(
                    self.dtype if self.dtype != jnp.float32 else None
                ),
            )
        return afno_filter_2d(
            x, w1, b1, w2, b2, self.modes, get_activation(self.act),
            compute_dtype=self.dtype,
        )


class Block(nn.Module):
    """Transformer block: GroupNorm(8) -> AFNO -> [optional double skip]
    -> GroupNorm(8) -> pointwise MLP -> residual
    (reference models/dpot.py:137-180; DPOTNet uses double_skip=False)."""

    width: int
    num_blocks: int = 8
    modes: int = 32
    mlp_ratio: float = 1.0
    double_skip: bool = False
    act: str = "gelu"
    dtype: Dtype = jnp.float32
    spatial_mesh: Any = None
    norm_groups: int = 8  # GroupNorm groups for norm1/norm2 (ref GroupNorm(8))

    def _use_fused_afno(self, x) -> bool:
        """Select the fused GroupNorm+AFNO Pallas kernel: bf16 compute,
        gelu, no spatial sharding, kernel-qualifying shapes (incl. the
        actual norm1 group count), and DPOT_AFNO_IMPL=fused (opt-in; see
        bench.py comparison)."""
        import os

        if os.environ.get("DPOT_AFNO_IMPL", "xla") != "fused":
            return False
        if self.dtype != jnp.bfloat16 or self.act != "gelu":
            return False
        if self.spatial_mesh is not None and (
            self.spatial_mesh.shape.get("spatial", 1) > 1
        ):
            return False
        from dpot_tpu.ops.pallas.afno_fused import fused_gn_afno_supported

        B, H, W, C = x.shape
        return fused_gn_afno_supported(
            H * W, C, self.num_blocks, B, groups=self.norm_groups,
            K=min(self.modes, H) * min(self.modes, W // 2 + 1),
        )

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        act = get_activation(self.act)
        hidden = int(self.width * self.mlp_ratio)

        residual = x
        filt = AFNO2D(
            width=self.width, num_blocks=self.num_blocks, modes=self.modes,
            act=self.act, dtype=self.dtype, spatial_mesh=self.spatial_mesh,
            pre_norm_groups=self.norm_groups, name="filter",
        )
        if self._use_fused_afno(x):
            # one VMEM-resident kernel for norm1 + the whole spectral
            # mixer (ops/pallas/afno_fused.py); params identical to the
            # composed path
            gn_params = GroupNorm(
                num_groups=self.norm_groups, name="norm1"
            )(x, only_params=True)
            x = filt(x, pre_norm=gn_params)
        else:
            x = GroupNorm(num_groups=self.norm_groups, name="norm1")(x)
            x = filt(x)
        if self.double_skip:
            x = x + residual
            residual = x
        x = GroupNorm(num_groups=self.norm_groups, name="norm2")(x)
        # 1x1 convs on channels-last == Dense over the channel axis
        x = nn.Dense(
            hidden, kernel_init=torch_linear_weight(), bias_init=torch_bias(self.width),
            dtype=self.dtype, name="mlp_fc1",
        )(x)
        x = act(x)
        x = nn.Dense(
            self.width, kernel_init=torch_linear_weight(), bias_init=torch_bias(hidden),
            dtype=self.dtype, name="mlp_fc2",
        )(x)
        return x + residual


def _grid_patches(H: int, W: int, T: int, p: int, dtype) -> jax.Array:
    """Patchified (x, y, t) coordinate-grid channels (reference get_grid_3d,
    models/dpot.py:350-360), at latent resolution: (h, w, T, p*p*3) with the
    same (a, b, c) flattening order as PatchConv's space-to-depth."""
    h, w = H // p, W // p
    gx = jnp.linspace(0, 1, H, dtype=jnp.float32).reshape(h, p)
    gy = jnp.linspace(0, 1, W, dtype=jnp.float32).reshape(w, p)
    gt = jnp.linspace(0, 1, T, dtype=jnp.float32)
    g = jnp.stack(
        [
            jnp.broadcast_to(gx[:, None, None, :, None], (h, w, T, p, p)),
            jnp.broadcast_to(gy[None, :, None, None, :], (h, w, T, p, p)),
            jnp.broadcast_to(gt[None, None, :, None, None], (h, w, T, p, p)),
        ],
        axis=-1,
    )  # (h, w, T, p, p, 3)
    return g.reshape(h, w, T, p * p * 3).astype(dtype)


class PatchConv(nn.Module):
    """Conv2d(k=p, s=p) lowered as space-to-depth + matmul.

    A non-overlapping strided conv IS a dense layer over p*p*C patch
    vectors; XLA's conv path handles the tiny unaligned channel counts of
    the patch embed (C_in=7) poorly on TPU (~10x off roofline measured),
    while this lowering is one well-tiled matmul. Params are named/shaped
    exactly like nn.Conv (kernel (p,p,C,E) HWIO + bias) so checkpoints are
    interchangeable. Works on (..., H, W, C) with any leading batch dims.

    append_grid: the reference concatenates (x, y, t) coordinate channels
    to the input before patchifying (models/dpot.py:364,350-360). Since
    [x; grid] @ W == x @ W[:, :C] + grid @ W[:, C:] and the grid term is
    batch-independent, folding it here computes the grid contribution once
    at LATENT resolution ((h, w, T, E) vs materializing + transposing
    (B, H, W, T, 3) at full resolution) — same parameters, same output.
    """

    features: int
    patch_size: int
    dtype: Dtype = jnp.float32
    append_grid: bool = False

    @nn.compact
    def __call__(self, x):
        """x: (N, H, W, C) or (B, H, W, T, C) — spatial always at axes
        (-3-has_t, -2-has_t); a trailing T axis rides between patches and
        channels without any full-resolution transpose."""
        p = self.patch_size
        has_t = x.ndim == 5
        if has_t:
            B, H, W, T, C = x.shape
        else:
            B, H, W, C = x.shape
        g = 3 if self.append_grid else 0
        kernel = self.param(
            "kernel", torch_linear_weight(), (p, p, C + g, self.features)
        )
        bias = self.param("bias", torch_bias((C + g) * p * p), (self.features,))
        h, w = H // p, W // p
        k = (
            kernel[:, :, :C, :].reshape(p * p * C, self.features)
            if g
            else kernel.reshape(p * p * C, self.features)
        ).astype(self.dtype)
        # cast before the space-to-depth transpose: halves its HBM traffic
        # under bf16 compute (identity under f32)
        x = x.astype(self.dtype)
        if has_t:
            x = x.reshape(B, h, p, w, p, T, C)
            x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6))  # B,h,w,T,p,p,C
            y = x.reshape(B, h, w, T, p * p * C) @ k
        else:
            x = x.reshape(B, h, p, w, p, C)
            x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))  # B,h,w,p,p,C
            y = x.reshape(B, h, w, p * p * C) @ k
        if g:
            assert has_t, "append_grid requires the (B,H,W,T,C) layout"
            k_grid = (
                kernel[:, :, C:, :]
                .reshape(p * p * 3, self.features)
                .astype(self.dtype)
            )
            y = y + _grid_patches(H, W, T, p, self.dtype) @ k_grid
        return y + bias.astype(self.dtype)


class UnpatchConv(nn.Module):
    """ConvTranspose2d(k=p, s=p) lowered as matmul + depth-to-space.

    Same rationale as PatchConv (measured ~20x faster than the XLA
    conv-transpose lowering at the DPOT head shapes). Params are
    named/shaped exactly like flax nn.ConvTranspose (kernel (p,p,D,O));
    equivalence is pinned by tests/test_patch_lowering.py.
    """

    features: int
    patch_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (..., h, w, D)
        p = self.patch_size
        *lead, h, w, D = x.shape
        # torch ConvTranspose2d computes fan_in from weight.size(1)*k*k =
        # OUT_channels*p*p (not in_channels like Conv2d) — both weight and
        # bias bounds use it; from-scratch inits must match the reference
        kernel = self.param(
            "kernel", torch_linear_weight(fan_in=self.features * p * p),
            (p, p, D, self.features),
        )
        bias = self.param(
            "bias", torch_bias(self.features * p * p), (self.features,)
        )
        lead_t = tuple(lead)
        nl = len(lead_t)
        k = (
            jnp.transpose(kernel, (2, 0, 1, 3))
            .reshape(D, p * p * self.features)
            .astype(self.dtype)
        )
        y = x.astype(self.dtype) @ k  # (..., h, w, p*p*O)
        y = y.reshape(*lead_t, h, w, p, p, self.features)
        perm = tuple(range(nl)) + (nl, nl + 2, nl + 1, nl + 3, nl + 4)
        y = jnp.transpose(y, perm)  # (..., h, p, w, p, O)
        y = y.reshape(*lead_t, h * p, w * p, self.features)
        return y + bias.astype(self.dtype)


class PatchEmbed(nn.Module):
    """Patchifier (reference models/dpot.py:183-209), matmul lowering."""

    patch_size: int
    embed_dim: int
    out_dim: int
    act: str = "gelu"
    dtype: Dtype = jnp.float32
    append_grid: bool = False  # fold the (x,y,t) grid channels (PatchConv)

    @nn.compact
    def __call__(self, x):  # (..., H, W, C_in)
        x = PatchConv(
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


class TimeAggregator(nn.Module):
    """Collapse T input frames into one latent frame
    (reference models/dpot.py:213-234)."""

    n_timesteps: int
    out_channels: int
    time_agg: str = "exp_mlp"  # 'mlp' | 'exp_mlp'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, T, C)
        T, C = self.n_timesteps, self.out_channels
        w = self.param(
            "w", scaled_normal(1.0 / (T * C**0.5)), (T, C, C)
        )
        x = x.astype(self.dtype)
        if self.time_agg == "exp_mlp":
            gamma = self.param("gamma", gamma_geometric(), (1, C))
            t = jnp.linspace(0.0, 1.0, x.shape[-2], dtype=jnp.float32)[:, None]
            t_embed = jnp.cos(t @ gamma).astype(self.dtype)  # (T, C)
            x = x * t_embed
        elif self.time_agg != "mlp":
            raise ValueError(f"unknown time_agg {self.time_agg!r}")
        # einsum('tij,...ti->...j') lowered as one flat matmul over (t,i)
        # (the direct einsum lowering measured ~7x off roofline on TPU)
        lead = x.shape[:-2]
        z = x.reshape(*lead, T * C) @ w.reshape(T * C, C).astype(self.dtype)
        return z


class DPOTNet(nn.Module):
    """Full 2D DPOT model (reference models/dpot.py:245-420)."""

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
    # mesh with a 'spatial' axis > 1 => pencil-decomposed AFNO (sp x dp);
    # see AFNO2D.spatial_mesh
    spatial_mesh: Any = None
    # mesh with a 'pipe' axis > 1 => GPipe-scheduled trunk
    # (parallel/pipeline.py); param tree stays canonical (blocks_{i})
    pipe_mesh: Any = None
    pipe_microbatches: int = 0  # 0 = one microbatch per pipeline stage

    @nn.compact
    def __call__(self, x):  # (B, X, Y, T, C)
        B, H, W, T, C = x.shape
        assert H == self.img_size and W == self.img_size, (
            f"input {H}x{W} != model img_size {self.img_size}"
        )
        act = get_activation(self.act)
        p = self.patch_size
        h, w_lat = H // p, W // p

        if self.normalize:
            # reversible instance norm + AdaIN (reference models/dpot.py:366-371)
            mu, sigma = instance_stats(x, axes=(1, 2, 3))  # (B,1,1,1,C)
            x = (x - mu) / sigma
            stats = jnp.concatenate([mu, sigma], axis=-1)[:, 0, 0, 0, :]  # (B, 2C)
            scale_mu = nn.Dense(
                self.embed_dim, kernel_init=torch_linear_weight(),
                bias_init=torch_bias(2 * self.in_channels), name="scale_feats_mu",
            )(stats)[:, None, None, :]
            scale_sigma = nn.Dense(
                self.embed_dim, kernel_init=torch_linear_weight(),
                bias_init=torch_bias(2 * self.in_channels), name="scale_feats_sigma",
            )(stats)[:, None, None, :]

        # coordinate grid channels (x, y, t) — reference get_grid_3d
        # (models/dpot.py:350-360) — folded into the patch matmul
        # (PatchConv.append_grid) instead of materialized at full res.
        # Per-frame patch embed, T riding along (no full-res transpose).
        x = PatchEmbed(
            patch_size=p,
            embed_dim=self.out_channels * p + 3,
            out_dim=self.embed_dim,
            act=self.act,
            dtype=self.dtype,
            append_grid=True,
            name="patch_embed",
        )(x)  # (B, h, w, T, D)

        pos_embed = self.param(
            "pos_embed", trunc_normal(0.02), (1, h, w_lat, self.embed_dim)
        )
        x = x + pos_embed[:, :, :, None, :]

        x = TimeAggregator(
            n_timesteps=self.in_timesteps,
            out_channels=self.embed_dim,
            time_agg=self.time_agg,
            dtype=self.dtype,
            name="time_agg",
        )(x)  # (B, h, w, D)

        if self.normalize:
            # cast the (f32 Dense-output) AdaIN scales to the compute dtype —
            # otherwise this promotes the residual stream to f32 for ALL
            # trunk blocks under bf16, doubling its HBM traffic
            x = (
                scale_sigma.astype(self.dtype) * x
                + scale_mu.astype(self.dtype)
            )  # AdaIN

        block_kwargs = dict(
            width=self.embed_dim,
            num_blocks=self.n_blocks,
            modes=self.modes,
            mlp_ratio=self.mlp_ratio,
            double_skip=False,
            act=self.act,
            dtype=self.dtype,
            spatial_mesh=self.spatial_mesh,
        )
        use_pipe = (
            self.pipe_mesh is not None
            and self.pipe_mesh.shape.get("pipe", 1) > 1
            and not self.is_initializing()  # init runs the plain loop so
            # the canonical blocks_{i} params get created
        )
        if use_pipe:
            assert self.spatial_mesh is None or (
                self.spatial_mesh.shape.get("spatial", 1) == 1
            ), "pipeline and spatial sharding cannot combine (yet)"
            from dpot_tpu.parallel.pipeline import pipeline_blocks

            layer_params = [
                self.variables["params"][f"blocks_{i}"]
                for i in range(self.depth)
            ]
            # a detached Block (parent=None): applied as a pure function
            # on each stage's stacked layer slices inside the pipeline
            template = Block(**block_kwargs, parent=None)

            def apply_one(p, c):
                return template.apply({"params": p}, c)

            if self.remat:
                apply_one = jax.checkpoint(apply_one)
            n_micro = self.pipe_microbatches or self.pipe_mesh.shape["pipe"]
            x = pipeline_blocks(
                layer_params, x, self.pipe_mesh, apply_one, n_micro
            )
        else:
            block = Block
            if self.remat:
                block = nn.remat(Block)
            for i in range(self.depth):
                x = block(**block_kwargs, name=f"blocks_{i}")(x)

        # dataset classifier head (reference models/dpot.py:303-309,394-395)
        cls_token = jnp.mean(x, axis=(1, 2))
        ct = cls_token
        for j, feats in enumerate([self.embed_dim, self.embed_dim, self.n_cls]):
            ct = nn.Dense(
                feats, kernel_init=torch_linear_weight(),
                bias_init=torch_bias(self.embed_dim), name=f"cls_head_{j}",
            )(ct)
            if j < 2:
                ct = act(ct)
        cls_pred = ct

        # output head (reference models/dpot.py:315-321,397-398)
        x = UnpatchConv(
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
        )(x)  # (B, X, Y, T_out*C_out)

        x = x.reshape(B, H, W, self.out_timesteps, self.out_channels)

        if self.normalize:
            x = x * sigma + mu

        return x.astype(jnp.float32), cls_pred.astype(jnp.float32)
