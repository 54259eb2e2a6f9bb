"""Anti-aliased resampling + filtered activations (CNO components).

TPU-native equivalents of the reference's filtered-activation layer
(models/filter_networks.py): `lrelu_filtered` ports LReLu_torch (:481-518:
bilinear-antialias upsample x2 -> LeakyReLU -> downsample -> optional
resize to out_size -> +bias) and `lrelu_regular` ports LReLu_regular
(:445-474). `low_pass_filter` ports CNOBlock.filter_frequency
(models/dpot_res.py:105-133) including its quirk of masking only the
NON-NEGATIVE frequency quadrant [:cutoff, :cutoff] of the full spectrum.

Resampling uses jax.image.resize (linear kernel, antialias on downsample)
— the same triangle-filter convention as torch F.interpolate(...,
antialias=True).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dpot_tpu.ops.fourier import fft2_pair, ifft2_pair


def resize_bilinear(
    x: jax.Array, out_hw: tuple[int, int], antialias: bool = True
) -> jax.Array:
    """Channels-last bilinear resize of (..., H, W, C) over (H, W)."""
    *lead, H, W, C = x.shape
    shape = (*lead, out_hw[0], out_hw[1], C)
    return jax.image.resize(x, shape, method="linear", antialias=antialias)


def lrelu_filtered(
    x: jax.Array,
    bias: jax.Array,
    in_size: int,
    out_size: int | None = None,
    negative_slope: float = 0.01,
) -> jax.Array:
    """LReLu_torch equivalent (filter_networks.py:481-518), channels-last
    (B, H, W, C): upsample x2 -> LeakyReLU -> downsample (antialiased) ->
    optional resize to out_size -> add per-channel bias."""
    out_size = out_size if out_size is not None else in_size
    x = resize_bilinear(x, (2 * in_size, 2 * in_size), antialias=True)
    x = jax.nn.leaky_relu(x, negative_slope)
    x = resize_bilinear(x, (in_size, in_size), antialias=True)
    if in_size != out_size:
        x = resize_bilinear(x, (out_size, out_size), antialias=True)
    return x + bias


def lrelu_regular(
    x: jax.Array,
    in_rate: int,
    out_rate: int,
    out_size: int,
    negative_slope: float = 0.01,
) -> jax.Array:
    """LReLu_regular equivalent (filter_networks.py:445-474): LeakyReLU then
    avg-pool (rate/2 or /4) or plain interpolation."""
    x = jax.nn.leaky_relu(x, negative_slope)
    if in_rate == 2 * out_rate:
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) / 4.0
    if in_rate == 4 * out_rate:
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return jax.lax.reduce_window(
            xp, 0.0, jax.lax.add, (1, 4, 4, 1), (1, 4, 4, 1), "VALID"
        ) / 16.0
    # reference fallback is F.interpolate with NO mode -> 'nearest'
    # (filter_networks.py:474): src = floor(dst * in/out), a pure gather
    H, W = x.shape[1], x.shape[2]
    ih = (jnp.arange(out_size) * (H / out_size)).astype(jnp.int32)
    iw = (jnp.arange(out_size) * (W / out_size)).astype(jnp.int32)
    return x[:, ih][:, :, iw]


def low_pass_filter(x: jax.Array, K: int) -> jax.Array:
    """CNOBlock.filter_frequency port (models/dpot_res.py:105-133),
    channels-last (B, H, W, C): full fft2 over (H, W), zero everything
    outside the [:H//K, :W//K] corner, ifft2, take real part. K=1 keeps the
    whole spectrum (identity), as the reference's conv_kernel=1 call sites
    do."""
    B, H, W, C = x.shape
    cutoff = H // K
    if cutoff >= H:
        return x
    re, im = fft2_pair(x.astype(jnp.float32), axes=(1, 2))
    mask = jnp.zeros((1, H, W, 1), jnp.float32).at[:, :cutoff, :cutoff, :].set(1.0)
    yr, _ = ifft2_pair(re * mask, im * mask, axes=(1, 2))
    return yr.astype(x.dtype)
