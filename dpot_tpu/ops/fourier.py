"""FFT layer with a matmul-DFT backend — the TPU-native transform.

Two implementations behind one (re, im)-pair API:

- 'dft': real/imag DFT matrices contracted on the MXU. For the sizes this
  framework runs (16x16 latent spectra, 64-512 grids) an N-point DFT is an
  (N, N) matmul — an exact systolic-array tile at N=128 — and benchmarks
  faster than XLA's FFT on TPU even where the latter exists. It is also the
  ONLY option on backends without an FFT lowering (the tunneled TPU in this
  image returns UNIMPLEMENTED for jnp.fft.*).
- 'xla': jnp.fft wrappers (CPU/GPU and as a cross-check in tests).

Everything is complex-free: spectra travel as (re, im) float pairs, which
keeps dtypes on the well-supported path and lets the AFNO block MLP fuse
into plain real matmuls.

Backend selection: DPOT_FFT_BACKEND env var ('dft'|'xla'), default 'dft'
on TPU-ish platforms, 'xla' elsewhere.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def default_backend() -> str:
    env = os.environ.get("DPOT_FFT_BACKEND")
    if env:
        return env
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    return "xla" if platform in ("cpu", "gpu", "cuda", "rocm") else "dft"


# ---------------------------------------------------------------------------
# DFT matrices (host-precomputed, closed over as constants -> folded by XLA)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=64)
def _fwd_mats(n: int):
    """Full N-point forward DFT: W[j,k] = exp(-2i pi j k / N).
    Returns (cos, sin) with sin carrying the minus sign."""
    j, k = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    ang = -2.0 * np.pi * j * k / n
    return (
        np.cos(ang).astype(np.float32),
        np.sin(ang).astype(np.float32),
    )


@lru_cache(maxsize=64)
def _rfwd_mats(n: int):
    """Real-input forward DFT keeping K = n//2+1 frequencies."""
    kk = n // 2 + 1
    j, k = np.meshgrid(np.arange(n), np.arange(kk), indexing="ij")
    ang = -2.0 * np.pi * j * k / n
    return (
        np.cos(ang).astype(np.float32),  # (n, K)
        np.sin(ang).astype(np.float32),
    )


@lru_cache(maxsize=64)
def _inv_mats(n: int):
    """Full N-point inverse DFT (unscaled): W[k,j] = exp(+2i pi j k / N)."""
    k, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    ang = 2.0 * np.pi * j * k / n
    return (
        np.cos(ang).astype(np.float32),
        np.sin(ang).astype(np.float32),
    )


@lru_cache(maxsize=64)
def _rinv_mats(n: int):
    """Hermitian-fold inverse for rfft spectra: maps K = n//2+1 frequency
    coefficients to n real samples (unscaled). Fold weights a_k double the
    interior frequencies."""
    kk = n // 2 + 1
    a = np.full(kk, 2.0)
    a[0] = 1.0
    if n % 2 == 0:
        a[-1] = 1.0
    k, j = np.meshgrid(np.arange(kk), np.arange(n), indexing="ij")
    ang = 2.0 * np.pi * j * k / n
    return (
        (a[:, None] * np.cos(ang)).astype(np.float32),  # (K, n)
        (a[:, None] * np.sin(ang)).astype(np.float32),
    )


def _cm(mats, dtype):
    """DFT constant matrices in the contraction dtype. Low-precision
    inputs (bf16/f16) get F32 matrices: tensordot(bf16, f32) promotes to
    f32, so every multi-stage transform accumulates n-term sums in f32 —
    a bf16 matrix would chain bf16 roundings per stage (~1e-2 relative
    drift at 512 points; the dist_fft bug class, commit d6130a2). Callers
    that want bf16 MXU inputs still get them (the bf16 operand stays
    bf16; only the accumulate/result is f32)."""
    dtype = jnp.dtype(dtype)
    if dtype in (jnp.bfloat16, jnp.float16):
        dtype = jnp.float32
    return tuple(jnp.asarray(m, dtype) for m in mats)


# ---------------------------------------------------------------------------
# axis transforms on channels-last arrays, (re, im) pair calculus
# ---------------------------------------------------------------------------

def _contract(x: jax.Array, mat: jax.Array, axis: int) -> jax.Array:
    """einsum x[..., j@axis, ...] * mat[j, k] -> x[..., k@axis, ...]."""
    axis = axis % x.ndim
    return jnp.tensordot(x, mat, axes=([axis], [0])).transpose(
        _restore_perm(x.ndim, axis)
    )


def _restore_perm(ndim: int, axis: int) -> tuple[int, ...]:
    # tensordot moves the contracted axis's replacement to the end
    rest = [i for i in range(ndim) if i != axis]
    out = [0] * ndim
    for pos, src in enumerate(rest):
        out[src] = pos
    out[axis] = ndim - 1
    return tuple(out)


def _rfft_axis(x: jax.Array, axis: int) -> tuple[jax.Array, jax.Array]:
    n = x.shape[axis]
    c, s = _cm(_rfwd_mats(n), x.dtype)
    return _contract(x, c, axis), _contract(x, s, axis)


def _fft_axis(
    re: jax.Array, im: jax.Array, axis: int
) -> tuple[jax.Array, jax.Array]:
    n = re.shape[axis]
    c, s = _cm(_fwd_mats(n), re.dtype)
    yr = _contract(re, c, axis) - _contract(im, s, axis)
    yi = _contract(im, c, axis) + _contract(re, s, axis)
    return yr, yi


def _ifft_axis(
    re: jax.Array, im: jax.Array, axis: int
) -> tuple[jax.Array, jax.Array]:
    n = re.shape[axis]
    c, s = _cm(_inv_mats(n), re.dtype)
    yr = _contract(re, c, axis) - _contract(im, s, axis)
    yi = _contract(im, c, axis) + _contract(re, s, axis)
    return yr, yi  # unscaled (missing 1/n)


def _irfft_axis(re: jax.Array, im: jax.Array, axis: int, n: int) -> jax.Array:
    c, s = _cm(_rinv_mats(n), re.dtype)
    return _contract(re, c, axis) - _contract(im, s, axis)  # unscaled


# ---------------------------------------------------------------------------
# public pair API
# ---------------------------------------------------------------------------

def rfft2_pair(
    x: jax.Array, axes: tuple[int, int] = (1, 2), norm: str = "ortho",
    backend: str | None = None,
) -> tuple[jax.Array, jax.Array]:
    """2D real FFT over `axes`; the second axis is halved (n//2+1).
    Returns (re, im)."""
    backend = backend or default_backend()
    a0, a1 = axes
    if backend == "xla":
        f = jnp.fft.rfft2(x, axes=axes, norm=norm)
        return f.real, f.imag
    re, im = _rfft_axis(x, a1)
    re, im = _fft_axis(re, im, a0)
    if norm == "ortho":
        scale = 1.0 / np.sqrt(x.shape[a0] * x.shape[a1])
        re, im = re * scale, im * scale
    elif norm == "forward":
        scale = 1.0 / (x.shape[a0] * x.shape[a1])
        re, im = re * scale, im * scale
    return re, im


def irfft2_pair(
    re: jax.Array, im: jax.Array, s: tuple[int, int],
    axes: tuple[int, int] = (1, 2), norm: str = "ortho",
    backend: str | None = None,
) -> jax.Array:
    backend = backend or default_backend()
    a0, a1 = axes
    if backend == "xla":
        return jnp.fft.irfft2(jax.lax.complex(re, im), s=s, axes=axes, norm=norm)
    h, w = s
    yr, yi = _ifft_axis(re, im, a0)  # unscaled by 1/h
    y = _irfft_axis(yr, yi, a1, w)  # unscaled by 1/w
    if norm == "ortho":
        y = y * (1.0 / np.sqrt(h * w))
    elif norm == "backward":
        y = y * (1.0 / (h * w))
    # 'forward': no scaling on inverse
    return y


def fft2_pair(
    x_re: jax.Array, x_im: jax.Array | None = None,
    axes: tuple[int, int] = (-2, -1), backend: str | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Full (complex) 2D FFT over `axes` on a (re, im) pair; x_im=None means
    real input. Unscaled ('backward' forward convention)."""
    backend = backend or default_backend()
    a0, a1 = axes
    if backend == "xla":
        z = x_re if x_im is None else jax.lax.complex(x_re, x_im)
        f = jnp.fft.fft2(z, axes=axes)
        return f.real, f.imag
    if x_im is None:
        x_im = jnp.zeros_like(x_re)
    re, im = _fft_axis(x_re, x_im, a1 % x_re.ndim)
    re, im = _fft_axis(re, im, a0 % x_re.ndim)
    return re, im


def ifft2_pair(
    re: jax.Array, im: jax.Array,
    axes: tuple[int, int] = (-2, -1), backend: str | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Full inverse 2D FFT (with 1/(H*W) scaling) on a (re, im) pair."""
    backend = backend or default_backend()
    a0, a1 = axes
    if backend == "xla":
        f = jnp.fft.ifft2(jax.lax.complex(re, im), axes=axes)
        return f.real, f.imag
    n = re.shape[a0] * re.shape[a1]
    yr, yi = _ifft_axis(re, im, a0 % re.ndim)
    yr, yi = _ifft_axis(yr, yi, a1 % re.ndim)
    return yr / n, yi / n


def fft3_pair(
    x_re: jax.Array, x_im: jax.Array | None = None,
    axes: tuple[int, int, int] = (-3, -2, -1), backend: str | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Full (complex) 3D FFT over `axes`; x_im=None means real input.
    Unscaled ('backward' forward convention)."""
    backend = backend or default_backend()
    if backend == "xla":
        z = x_re if x_im is None else jax.lax.complex(x_re, x_im)
        f = jnp.fft.fftn(z, axes=axes)
        return f.real, f.imag
    if x_im is None:
        x_im = jnp.zeros_like(x_re)
    re, im = x_re, x_im
    for a in axes:
        re, im = _fft_axis(re, im, a % x_re.ndim)
    return re, im


def rfft3_pair(
    x: jax.Array, axes: tuple[int, int, int] = (1, 2, 3), norm: str = "ortho",
    backend: str | None = None,
) -> tuple[jax.Array, jax.Array]:
    """3D real FFT (last of `axes` halved). Returns (re, im)."""
    backend = backend or default_backend()
    a0, a1, a2 = axes
    if backend == "xla":
        f = jnp.fft.rfftn(x, axes=axes, norm=norm)
        return f.real, f.imag
    re, im = _rfft_axis(x, a2)
    re, im = _fft_axis(re, im, a1)
    re, im = _fft_axis(re, im, a0)
    n = x.shape[a0] * x.shape[a1] * x.shape[a2]
    if norm == "ortho":
        re, im = re / np.sqrt(n), im / np.sqrt(n)
    elif norm == "forward":
        re, im = re / n, im / n
    return re, im


def irfft3_pair(
    re: jax.Array, im: jax.Array, s: tuple[int, int, int],
    axes: tuple[int, int, int] = (1, 2, 3), norm: str = "ortho",
    backend: str | None = None,
) -> jax.Array:
    backend = backend or default_backend()
    a0, a1, a2 = axes
    if backend == "xla":
        return jnp.fft.irfftn(jax.lax.complex(re, im), s=s, axes=axes, norm=norm)
    d0, d1, d2 = s
    yr, yi = _ifft_axis(re, im, a0)
    yr, yi = _ifft_axis(yr, yi, a1)
    y = _irfft_axis(yr, yi, a2, d2)
    n = d0 * d1 * d2
    if norm == "ortho":
        y = y / np.sqrt(n)
    elif norm == "backward":
        y = y / n
    return y
