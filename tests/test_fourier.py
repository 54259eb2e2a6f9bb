"""Matmul-DFT backend parity vs numpy FFT (all norms, odd/even sizes, 2D/3D,
gradients)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dpot_tpu.ops.fourier import (
    irfft2_pair,
    irfft3_pair,
    rfft2_pair,
    rfft3_pair,
)


@pytest.mark.parametrize("hw", [(16, 16), (8, 12), (9, 7)])
@pytest.mark.parametrize("norm", ["ortho", "backward", "forward"])
def test_rfft2_dft_matches_numpy(hw, norm):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *hw, 3)).astype(np.float32)
    re, im = rfft2_pair(jnp.asarray(x), axes=(1, 2), norm=norm, backend="dft")
    want = np.fft.rfft2(x, axes=(1, 2), norm=norm)
    np.testing.assert_allclose(np.asarray(re), want.real, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(im), want.imag, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("hw", [(16, 16), (8, 12), (9, 7)])
@pytest.mark.parametrize("norm", ["ortho", "backward"])
def test_irfft2_dft_roundtrip(hw, norm):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, *hw, 3)).astype(np.float32)
    re, im = rfft2_pair(jnp.asarray(x), axes=(1, 2), norm=norm, backend="dft")
    y = irfft2_pair(re, im, s=hw, axes=(1, 2), norm=norm, backend="dft")
    np.testing.assert_allclose(np.asarray(y), x, atol=2e-4, rtol=2e-4)


def test_irfft2_dft_matches_numpy_on_arbitrary_spectrum():
    """Not just roundtrips: an arbitrary (non-hermitian-derived) half
    spectrum must invert identically to numpy's irfft2."""
    rng = np.random.default_rng(2)
    H, W = 12, 16
    re = rng.standard_normal((2, H, W // 2 + 1, 3)).astype(np.float32)
    im = rng.standard_normal((2, H, W // 2 + 1, 3)).astype(np.float32)
    got = irfft2_pair(
        jnp.asarray(re), jnp.asarray(im), s=(H, W), axes=(1, 2),
        norm="ortho", backend="dft",
    )
    want = np.fft.irfft2(re + 1j * im, s=(H, W), axes=(1, 2), norm="ortho")
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("norm", ["ortho"])
def test_rfft3_dft_matches_numpy(norm):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 6, 8, 5, 2)).astype(np.float32)
    re, im = rfft3_pair(jnp.asarray(x), axes=(1, 2, 3), norm=norm, backend="dft")
    want = np.fft.rfftn(x, axes=(1, 2, 3), norm=norm)
    np.testing.assert_allclose(np.asarray(re), want.real, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(im), want.imag, atol=2e-4, rtol=2e-4)

    y = irfft3_pair(re, im, s=(6, 8, 5), axes=(1, 2, 3), norm=norm, backend="dft")
    np.testing.assert_allclose(np.asarray(y), x, atol=2e-4, rtol=2e-4)


def test_dft_backend_differentiable():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 2)), jnp.float32)

    def f(x):
        re, im = rfft2_pair(x, backend="dft")
        y = irfft2_pair(re * 2.0, im * 2.0, s=(8, 8), backend="dft")
        return jnp.sum(jnp.square(y))

    g = jax.grad(f)(x)
    # analytic: y = 2x (linearity), f = 4*sum(x^2), df/dx = 8x
    np.testing.assert_allclose(np.asarray(g), 8 * np.asarray(x), atol=1e-3)


def test_afno_with_dft_backend_matches_xla(monkeypatch):
    """The AFNO mixer must be numerically identical under both FFT
    backends (CPU cross-check for what runs on TPU)."""
    from dpot_tpu.ops.activations import get_activation
    from dpot_tpu.ops.spectral import afno_filter_2d

    rng = np.random.default_rng(5)
    B, H, W, C, nb = 2, 16, 16, 32, 4
    bs = C // nb
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    args = [
        jnp.asarray(rng.random(s), jnp.float32)
        for s in [(2, nb, bs, bs), (2, nb, bs), (2, nb, bs, bs), (2, nb, bs)]
    ]
    monkeypatch.setenv("DPOT_FFT_BACKEND", "xla")
    y_xla = afno_filter_2d(x, *args, 8, get_activation("gelu"))
    monkeypatch.setenv("DPOT_FFT_BACKEND", "dft")
    y_dft = afno_filter_2d(x, *args, 8, get_activation("gelu"))
    np.testing.assert_allclose(
        np.asarray(y_xla), np.asarray(y_dft), atol=5e-4, rtol=5e-4
    )
