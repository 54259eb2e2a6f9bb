"""CDPOT + resample op tests: filtered-activation parity vs torch
LReLu_torch math, low-pass quirk preservation, full-model forward."""

import numpy as np
import torch
import torch.nn.functional as TF
import jax
import jax.numpy as jnp
import pytest

from dpot_tpu.models.cdpot import CDPOTNet
from dpot_tpu.ops.resample import (
    low_pass_filter,
    lrelu_filtered,
    resize_bilinear,
)


def test_resize_bilinear_antialias_close_to_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), (8, 8), antialias=True))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = (
        TF.interpolate(xt, size=(8, 8), mode="bilinear", antialias=True)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    # jax.image.resize and torch antialias both use triangle filters but
    # differ slightly at borders; mid-region agreement is tight
    np.testing.assert_allclose(got[:, 2:-2, 2:-2], want[:, 2:-2, 2:-2],
                               atol=5e-3, rtol=5e-2)


def test_lrelu_filtered_matches_torch_pipeline():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    bias = rng.standard_normal(4).astype(np.float32)
    got = np.asarray(lrelu_filtered(jnp.asarray(x), jnp.asarray(bias), in_size=8))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    y = TF.interpolate(xt, size=16, mode="bilinear", antialias=True)
    y = torch.nn.LeakyReLU()(y)
    y = TF.interpolate(y, size=8, mode="bilinear", antialias=True)
    want = (y.permute(0, 2, 3, 1) + torch.from_numpy(bias)).numpy()
    np.testing.assert_allclose(got[:, 1:-1, 1:-1], want[:, 1:-1, 1:-1],
                               atol=1e-2, rtol=1e-1)


def test_low_pass_filter_identity_at_k1():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    y = np.asarray(low_pass_filter(jnp.asarray(x), 1))
    np.testing.assert_allclose(y, x, atol=1e-5)


def test_low_pass_filter_matches_torch_quirk():
    """The reference masks only [:cutoff, :cutoff] of the FULL spectrum
    (models/dpot_res.py:113-127) — asymmetric. Preserve exactly."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    got = np.asarray(low_pass_filter(jnp.asarray(x), 2))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    f = torch.fft.fft2(xt)
    mask = torch.zeros(8, 8, dtype=torch.bool)
    mask[:4, :4] = 1
    want = torch.fft.ifft2(f * mask).real.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_cdpot_forward():
    model = CDPOTNet(
        img_size=16, patch_size=4, in_channels=2, out_channels=2,
        in_timesteps=4, out_timesteps=1, embed_dim=32, depth=1, n_blocks=4,
        modes=4, out_layer_dim=8, n_cls=3, normalize=True,
    )
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 4, 2))
    params = model.init(jax.random.key(1), x)
    y, cls = model.apply(params, x)
    assert y.shape == (2, 16, 16, 1, 2)
    assert cls.shape == (2, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_lrelu_regular_golden_all_branches():
    """LReLu_regular parity incl. the interpolation FALLBACK branch: the
    reference's F.interpolate has NO mode -> 'nearest' (a bilinear
    fallback silently diverged). Golden vs torch for /2 avg-pool, /4
    padded avg-pool, and nearest resize (both up and down)."""
    import torch
    import torch.nn.functional as F

    from dpot_tpu.ops.resample import lrelu_regular

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 12, 12, 3)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)

    def want(in_rate, out_rate, out_size):
        a = F.leaky_relu(xt, 0.01)
        if in_rate == 2 * out_rate:
            o = torch.nn.AvgPool2d(2, stride=2, padding=0)(a)
        elif in_rate == 4 * out_rate:
            o = torch.nn.AvgPool2d(4, stride=4, padding=1)(a)
        else:
            o = F.interpolate(a, size=out_size)  # mode defaults to nearest
        return o.permute(0, 2, 3, 1).numpy()

    for in_rate, out_rate, out_size in (
        (4, 2, 6),    # /2 avg-pool
        (8, 2, 3),    # /4 padded avg-pool (count_include_pad)
        (4, 4, 12),   # fallback, identity size
        (4, 3, 9),    # fallback, downsample
        (3, 4, 16),   # fallback, upsample
    ):
        got = np.asarray(
            lrelu_regular(jnp.asarray(x), in_rate, out_rate, out_size)
        )
        np.testing.assert_allclose(
            got, want(in_rate, out_rate, out_size), atol=1e-6,
            err_msg=f"in_rate={in_rate} out_rate={out_rate}",
        )
