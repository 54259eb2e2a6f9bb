"""Golden-value tests for the AFNO mixer and spectral resize against an
independent torch implementation of the same math (the equations documented
in SURVEY.md §2.1, i.e. reference models/dpot.py:51-110 and
utils/utilities.py:277-305)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF
import jax
import jax.numpy as jnp

from dpot_tpu.ops.activations import get_activation
from dpot_tpu.ops.spectral import (
    afno_filter_2d,
    afno_filter_3d,
    spectral_resize,
)


def torch_afno2d(x, w1, b1, w2, b2, modes):
    """Independent torch reimplementation of the AFNO2D equations for
    golden-checking (channels-last input B,H,W,C)."""
    x = torch.from_numpy(x)
    B, H, W, C = x.shape
    nb, bs = w1.shape[1], w1.shape[2]
    xo = x
    f = torch.fft.rfft2(x, dim=(1, 2), norm="ortho")
    f = f.reshape(B, f.shape[1], f.shape[2], nb, bs)
    k = min(modes, 10**9)
    w1t, b1t, w2t, b2t = map(torch.from_numpy, (w1, b1, w2, b2))
    corner = f[:, :k, :k]
    o1r = TF.gelu(
        torch.einsum("...bi,bio->...bo", corner.real, w1t[0])
        - torch.einsum("...bi,bio->...bo", corner.imag, w1t[1])
        + b1t[0]
    )
    o1i = TF.gelu(
        torch.einsum("...bi,bio->...bo", corner.imag, w1t[0])
        + torch.einsum("...bi,bio->...bo", corner.real, w1t[1])
        + b1t[1]
    )
    o2r = torch.zeros_like(f.real)
    o2i = torch.zeros_like(f.real)
    o2r[:, :k, :k] = (
        torch.einsum("...bi,bio->...bo", o1r, w2t[0])
        - torch.einsum("...bi,bio->...bo", o1i, w2t[1])
        + b2t[0]
    )
    o2i[:, :k, :k] = (
        torch.einsum("...bi,bio->...bo", o1i, w2t[0])
        + torch.einsum("...bi,bio->...bo", o1r, w2t[1])
        + b2t[1]
    )
    out = torch.complex(o2r, o2i).reshape(B, f.shape[1], f.shape[2], C)
    y = torch.fft.irfft2(out, s=(H, W), dim=(1, 2), norm="ortho")
    return (y + xo).numpy()


@pytest.mark.parametrize("modes", [32, 6])
def test_afno2d_matches_torch(modes):
    rng = np.random.default_rng(0)
    B, H, W, C, nb = 2, 16, 16, 32, 4
    bs = C // nb
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    scale = 1.0 / (bs * bs)
    w1 = (scale * rng.random((2, nb, bs, bs))).astype(np.float32)
    b1 = (scale * rng.random((2, nb, bs))).astype(np.float32)
    w2 = (scale * rng.random((2, nb, bs, bs))).astype(np.float32)
    b2 = (scale * rng.random((2, nb, bs))).astype(np.float32)

    got = np.asarray(
        afno_filter_2d(
            jnp.asarray(x), jnp.asarray(w1), jnp.asarray(b1), jnp.asarray(w2),
            jnp.asarray(b2), modes, get_activation("gelu"),
        )
    )
    # golden: torch slicing [:modes,:modes] silently clamps to dims
    want = torch_afno2d(x, w1, b1, w2, b2, modes)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_afno3d_shapes_and_energy():
    rng = np.random.default_rng(1)
    B, H, W, L, C, nb = 1, 8, 8, 6, 16, 4
    bs = C // nb
    x = rng.standard_normal((B, H, W, L, C)).astype(np.float32)
    scale = 1.0 / (bs * bs)
    args = [
        (scale * rng.random(s)).astype(np.float32)
        for s in [(2, nb, bs, bs), (2, nb, bs), (2, nb, bs, bs), (2, nb, bs)]
    ]
    y = afno_filter_3d(
        jnp.asarray(x), *[jnp.asarray(a) for a in args], 4, 2,
        get_activation("gelu"),
    )
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    # zero weights => pure residual
    y0 = afno_filter_3d(
        jnp.asarray(x), *[jnp.zeros_like(jnp.asarray(a)) for a in args], 4, 2,
        get_activation("gelu"),
    )
    np.testing.assert_allclose(np.asarray(y0), x, atol=1e-5)


def torch_resize(x, out_size):
    x = torch.from_numpy(x)
    f = torch.fft.rfft2(x, norm="backward")
    f_z = torch.zeros(
        (*x.shape[:-2], out_size[0], out_size[1] // 2 + 1), dtype=f.dtype
    )
    top1 = min((f.shape[-2] + 1) // 2, (out_size[0] + 1) // 2)
    top2 = min(f.shape[-1], out_size[1] // 2 + 1)
    bot1 = min(f.shape[-2] // 2, out_size[0] // 2)
    f_z[..., :top1, :top2] = f[..., :top1, :top2]
    f_z[..., -bot1:, :top2] = f[..., -bot1:, :top2]
    y = torch.fft.irfft2(f_z, s=out_size).real
    y = y * (out_size[0] / x.shape[-2]) * (out_size[1] / x.shape[-1])
    return y.numpy()


@pytest.mark.parametrize("out", [(8, 8), (32, 32), (17, 17)])
def test_spectral_resize_matches_torch(out):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    got = np.asarray(spectral_resize(jnp.asarray(x), out))
    want = torch_resize(x, out)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_spectral_resize_roundtrip_identity():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 1, 16, 16)).astype(np.float32)
    y = spectral_resize(jnp.asarray(x), (16, 16))
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)
