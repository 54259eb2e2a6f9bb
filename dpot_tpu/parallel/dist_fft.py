"""Distributed AFNO spectral mixer over a spatially-sharded mesh axis.

The reference never shards space — it *downscales* 512^2 data to 128^2 to
fit (griddataset.py:96). This module is the TPU-native extension
(SURVEY.md §2.5/§7): shard the H axis over the 'spatial' mesh axis and run
the rfft2 as a pencil decomposition —

  local rfft over W  ->  all_to_all transpose (gather H, split W-freqs)
  -> local FFT over H -> block-diagonal mode MLP on the kept corner
  -> local inverse FFT over H -> all_to_all back -> local irfft over W

The all-to-alls ride ICI inside `shard_map`; everything between them is
purely local matmul-DFT work, so the op scales H beyond a single chip's
HBM. Numerics match the single-device afno_filter_2d exactly (see
tests/test_dist_fft.py).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dpot_tpu.ops.fourier import (
    _fft_axis,
    _ifft_axis,
    _irfft_axis,
    _rfft_axis,
)
from dpot_tpu.ops.spectral import afno_mode_mlp


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def afno_filter_2d_sharded(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    modes: int,
    act: Callable,
    mesh: Mesh,
    axis_name: str = "spatial",
    batch_axis: str | None = None,
    compute_dtype=None,
    slice_modes: bool = True,
) -> jax.Array:
    """AFNO 2D mixer with H sharded over `axis_name`. x: (B, H, W, C)
    global; H % axis_size == 0 required.

    batch_axis: optional mesh axis the batch is data-parallel over. When
    set, the shard_map splits B over it too (each data group runs its own
    pencil FFT; the all_to_alls stay within a 'spatial' subgroup), which
    is what the model-integrated dp x sp path uses. When None the batch
    axis is replicated across 'data' (standalone-op usage).

    compute_dtype: bf16 runs the mode MLP at full MXU rate AND moves the
    spectra through both all_to_all transposes at half the ICI bytes; the
    DFT matmul stages themselves stay f32 (spectra are cast bf16 ONLY
    across the transposes and restored to f32 on arrival — a bf16 input
    would make ops/fourier build bf16 DFT matrices and chain 512-term
    sums in bf16, drifting from the single-chip path, whose FFTs
    accumulate in f32). None (default) is the f32 golden-parity path.

    slice_modes: run the 2-layer mode MLP only on the kept spectral corner
    (rows [:kh] are contiguous after the H-gather; the kept W-freq columns
    are a PREFIX of every shard's local columns since global col =
    shard_idx*wfs + j) instead of on every local mode + mask — ~H/kh x
    fewer MLP FLOPs (2x at the 512^2/patch-8 shape). False keeps the
    compute-everywhere path (used by the FLOP-reduction regression test)."""
    B, H, W, C = x.shape
    s = mesh.shape[axis_name]
    assert H % s == 0, f"H={H} must divide spatial axis {s}"
    Wf = W // 2 + 1
    Wfp = _cdiv(Wf, s) * s  # pad W-frequencies to divide the axis
    kh = min(modes, H)
    kw = min(modes, Wf)
    nb = w1.shape[1]
    bs = C // nb
    scale = 1.0 / np.sqrt(H * W)

    def local(x, w1, b1, w2, b2):
        # x: (Bl, H/s, W, C) with Bl = B / (batch_axis size)
        Bl = x.shape[0]
        idx = jax.lax.axis_index(axis_name)
        x32 = x.astype(jnp.float32)

        # 1) local rfft over W
        re, im = _rfft_axis(x32, 2)  # (B, H/s, Wf, C), unscaled
        if compute_dtype is not None:
            # half the ICI bytes through the transpose (bf16 on the WIRE
            # only — restored to f32 on arrival so the H-FFT's DFT
            # matrices and 512-term sums stay f32, matching single-chip)
            re, im = re.astype(compute_dtype), im.astype(compute_dtype)
        pad = ((0, 0), (0, 0), (0, Wfp - Wf), (0, 0))
        re, im = jnp.pad(re, pad), jnp.pad(im, pad)

        # 2) transpose: gather H, split W-freqs
        re = jax.lax.all_to_all(re, axis_name, split_axis=2, concat_axis=1,
                                tiled=True)  # (B, H, Wfp/s, C)
        im = jax.lax.all_to_all(im, axis_name, split_axis=2, concat_axis=1,
                                tiled=True)
        if compute_dtype is not None:
            re, im = re.astype(jnp.float32), im.astype(jnp.float32)

        # 3) local FFT over H + ortho scale
        re, im = _fft_axis(re, im, 1)
        re, im = re * scale, im * scale

        wfs = Wfp // s
        if slice_modes:
            # 4) mode MLP on the kept corner only. Non-kept modes are
            # zeroed in the output spectrum (AFNO semantics), so slicing
            # [:kh, :cw] before the MLP and zero-padding after is exact;
            # only boundary shards spend (cw - kept) columns of dead work,
            # masked below.
            cw = min(wfs, kw)
            n_k = Bl * kh * cw
            o_re, o_im = afno_mode_mlp(
                re[:, :kh, :cw].reshape(n_k, nb, bs),
                im[:, :kh, :cw].reshape(n_k, nb, bs),
                w1, b1, w2, b2, act, compute_dtype=compute_dtype,
            )
            o_re = o_re.reshape(Bl, kh, cw, C)
            o_im = o_im.reshape(Bl, kh, cw, C)
            gcol = idx * wfs + jnp.arange(cw)
            col_keep = (gcol < kw)[None, None, :, None]
            o_re = jnp.where(col_keep, o_re, 0.0)
            o_im = jnp.where(col_keep, o_im, 0.0)
            pad_out = ((0, 0), (0, H - kh), (0, wfs - cw), (0, 0))
            o_re = jnp.pad(o_re, pad_out)
            o_im = jnp.pad(o_im, pad_out)
        else:
            # mode MLP on every local mode, then mask to the kept corner
            n_local = Bl * H * wfs
            o_re, o_im = afno_mode_mlp(
                re.reshape(n_local, nb, bs), im.reshape(n_local, nb, bs),
                w1, b1, w2, b2, act, compute_dtype=compute_dtype,
            )
            o_re = o_re.reshape(Bl, H, wfs, C)
            o_im = o_im.reshape(Bl, H, wfs, C)
            row_keep = (jnp.arange(H) < kh)[None, :, None, None]
            gcol = idx * wfs + jnp.arange(wfs)
            col_keep = (gcol < kw)[None, None, :, None]
            keep = jnp.logical_and(row_keep, col_keep)
            o_re = jnp.where(keep, o_re, 0.0)
            o_im = jnp.where(keep, o_im, 0.0)

        # 5) local inverse FFT over H (unscaled) — f32 inputs: the mode
        # MLP may return compute_dtype
        yr, yi = _ifft_axis(
            o_re.astype(jnp.float32), o_im.astype(jnp.float32), 1
        )
        if compute_dtype is not None:
            # bf16 on the wire again; back to f32 for the final irfft
            yr, yi = yr.astype(compute_dtype), yi.astype(compute_dtype)

        # 6) transpose back: split H, gather W-freqs
        yr = jax.lax.all_to_all(yr, axis_name, split_axis=1, concat_axis=2,
                                tiled=True)  # (B, H/s, Wfp, C)
        yi = jax.lax.all_to_all(yi, axis_name, split_axis=1, concat_axis=2,
                                tiled=True)
        yr, yi = yr[:, :, :Wf].astype(jnp.float32), yi[:, :, :Wf].astype(jnp.float32)

        # 7) local irfft over W + ortho scale
        y = _irfft_axis(yr, yi, 2, W) * scale
        return (y + x32).astype(x.dtype)

    spec = P(batch_axis, axis_name, None, None)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, P(), P(), P(), P()),
        out_specs=spec,
    )(x, w1, b1, w2, b2)
