"""Shape/sanity tests for the non-flagship model families: DPOTNet3D,
FNO2d/FNO3d, UNet (reference models/dpot3d.py, models/fno.py,
models/unet.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dpot_tpu.models.dpot3d import DPOTNet3D
from dpot_tpu.models.fno import FNO2d, FNO3d, SpectralConv2d
from dpot_tpu.models.unet import UNet


def test_dpot3d_forward():
    model = DPOTNet3D(
        img_size=16, patch_size=4, in_channels=2, out_channels=2,
        in_timesteps=3, out_timesteps=1, embed_dim=32, depth=1, n_blocks=4,
        modes=4, temporal_modes=3, n_cls=2, normalize=True,
    )
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 16, 3, 2))
    params = model.init(jax.random.key(1), x)
    y = model.apply(params, x)
    assert y.shape == (2, 16, 16, 16, 1, 2)
    assert np.isfinite(np.asarray(y)).all()


def test_spectral_conv2d_matches_reference_math():
    """Golden check against an independent torch computation of the
    FNO spectral conv (reference models/fno.py:14-55)."""
    import torch

    rng = np.random.default_rng(0)
    B, H, W, C = 2, 16, 16, 8
    m = 4
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    conv = SpectralConv2d(C, C, m, m)
    params = conv.init(jax.random.key(0), jnp.asarray(x))
    got = np.asarray(conv.apply(params, jnp.asarray(x)))

    w1 = np.asarray(params["params"]["weights1"])
    w2 = np.asarray(params["params"]["weights2"])
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # torch NCHW
    ft = torch.fft.rfft2(xt)
    out = torch.zeros(B, C, H, W // 2 + 1, dtype=torch.cfloat)

    def cmul(inp, w):
        wr, wi = torch.from_numpy(w[0]), torch.from_numpy(w[1])
        return torch.complex(
            torch.einsum("bixy,ioxy->boxy", inp.real, wr)
            - torch.einsum("bixy,ioxy->boxy", inp.imag, wi),
            torch.einsum("bixy,ioxy->boxy", inp.real, wi)
            + torch.einsum("bixy,ioxy->boxy", inp.imag, wr),
        )

    out[:, :, :m, :m] = cmul(ft[:, :, :m, :m], w1)
    out[:, :, -m:, :m] = cmul(ft[:, :, -m:, :m], w2)
    want = torch.fft.irfft2(out, s=(H, W)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_fno2d_forward():
    model = FNO2d(
        modes1=8, modes2=8, width=32, img_size=32, n_channels=2,
        in_timesteps=4, out_timesteps=1, n_layers=2, patch_size=2,
        use_ln=True, normalize=True, n_cls=3,
    )
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 4, 2))
    params = model.init(jax.random.key(1), x)
    y, cls = model.apply(params, x)
    assert y.shape == (2, 16, 16, 1, 2)  # patchified output (reference keeps latent res)
    assert cls.shape == (2, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_fno2d_patch1_keeps_resolution():
    model = FNO2d(
        modes1=8, modes2=8, width=32, img_size=16, n_channels=1,
        in_timesteps=4, n_layers=1, patch_size=1, n_cls=1,
    )
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 4, 1))
    params = model.init(jax.random.key(1), x)
    y, _ = model.apply(params, x)
    assert y.shape == (2, 16, 16, 1, 1)


def test_fno3d_forward():
    model = FNO3d(
        modes1=4, modes2=4, modes3=4, width=16, img_size=16, n_channels=2,
        in_timesteps=3, out_timesteps=1, n_layers=2,
    )
    x = jax.random.normal(jax.random.key(0), (1, 16, 16, 16, 3, 2))
    params = model.init(jax.random.key(1), x)
    y = model.apply(params, x)
    assert y.shape == (1, 16, 16, 16, 1, 2)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.parametrize("spatial", [(32, 32), (24, 40)])
def test_unet_forward_2d(spatial):
    model = UNet(in_channels=2, out_channels=2, out_timesteps=1, width=8,
                 n_dim=2, n_cls=4)
    x = jax.random.normal(jax.random.key(0), (2, *spatial, 4, 2))
    params = model.init(jax.random.key(1), x)
    y, cls = model.apply(params, x)
    assert y.shape == (2, *spatial, 1, 2)
    assert cls.shape == (2, 4)
    assert (np.asarray(cls) == 0).all()


@pytest.mark.slow
def test_unet_forward_3d():
    model = UNet(in_channels=1, out_channels=1, out_timesteps=2, width=4,
                 n_dim=3, n_cls=1)
    x = jax.random.normal(jax.random.key(0), (1, 16, 16, 16, 3, 1))
    params = model.init(jax.random.key(1), x)
    y, _ = model.apply(params, x)
    assert y.shape == (1, 16, 16, 16, 2, 1)
