"""PatchConv / UnpatchConv matmul lowerings must match the conv modules
they replace (same params, same math, faster TPU lowering)."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from dpot_tpu.models.dpot import PatchConv, UnpatchConv


def test_patchconv_matches_conv():
    rng = np.random.default_rng(0)
    p, C, E = 4, 7, 16
    x = jnp.asarray(rng.standard_normal((2, 16, 16, C)), jnp.float32)
    pc = PatchConv(E, p)
    params = pc.init(jax.random.key(0), x)
    got = pc.apply(params, x)

    conv = nn.Conv(E, kernel_size=(p, p), strides=(p, p), padding="VALID")
    want = conv.apply(
        {"params": {"kernel": params["params"]["kernel"],
                    "bias": params["params"]["bias"]}}, x
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5,
                               rtol=1e-5)


def test_patchconv_with_time_axis():
    rng = np.random.default_rng(1)
    p, C, E, T = 4, 3, 8, 5
    x5 = jnp.asarray(rng.standard_normal((2, 8, 8, T, C)), jnp.float32)
    pc = PatchConv(E, p)
    params = pc.init(jax.random.key(0), x5)
    got = pc.apply(params, x5)  # (2, 2, 2, T, E)
    # fold T into batch and use the rank-4 path
    x4 = jnp.transpose(x5, (0, 3, 1, 2, 4)).reshape(2 * T, 8, 8, C)
    want4 = pc.apply(params, x4).reshape(2, T, 2, 2, E)
    want = jnp.transpose(want4, (0, 2, 3, 1, 4))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_unpatchconv_matches_torch_convtranspose():
    """UnpatchConv + the _unpatch interop mapping must reproduce torch
    ConvTranspose2d(k=p, s=p) exactly."""
    import torch

    from dpot_tpu.train.interop import _unpatch

    torch.manual_seed(0)
    D, O, p = 8, 5, 4
    tconv = torch.nn.ConvTranspose2d(D, O, kernel_size=p, stride=p)
    x = np.random.default_rng(2).standard_normal((2, 6, 6, D)).astype(np.float32)
    with torch.no_grad():
        want = (
            tconv(torch.from_numpy(x).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1)
            .numpy()
        )
    sd = {".weight": tconv.state_dict()["weight"],
          ".bias": tconv.state_dict()["bias"]}
    kb = _unpatch(sd, "")
    up = UnpatchConv(O, p)
    got = up.apply(
        {"params": {"kernel": jnp.asarray(kb["kernel"]),
                    "bias": jnp.asarray(kb["bias"])}},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-4)


def test_timeagg_matmul_matches_einsum():
    from dpot_tpu.models.dpot import TimeAggregator

    rng = np.random.default_rng(3)
    T, C = 6, 32
    x = jnp.asarray(rng.standard_normal((2, 4, 4, T, C)), jnp.float32)
    ta = TimeAggregator(n_timesteps=T, out_channels=C)
    params = ta.init(jax.random.key(0), x)
    got = ta.apply(params, x)
    w = params["params"]["w"]
    gamma = params["params"]["gamma"]
    t = jnp.linspace(0, 1, T)[:, None]
    want = jnp.einsum("tij,...ti->...j", w, x * jnp.cos(t @ gamma))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4,
                               rtol=1e-4)


def test_patchconv3d_matches_conv3d():
    from dpot_tpu.models.dpot3d import PatchConv3D

    rng = np.random.default_rng(4)
    p, C, E = 2, 3, 8
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8, C)), jnp.float32)
    pc = PatchConv3D(E, p)
    params = pc.init(jax.random.key(0), x)
    got = pc.apply(params, x)
    conv = nn.Conv(E, kernel_size=(p, p, p), strides=(p, p, p), padding="VALID")
    want = conv.apply({"params": dict(params["params"])}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5,
                               rtol=1e-5)


def test_unpatchconv3d_matches_torch():
    import torch

    from dpot_tpu.models.dpot3d import UnpatchConv3D

    torch.manual_seed(2)
    D, O, p = 6, 4, 2
    tconv = torch.nn.ConvTranspose3d(D, O, kernel_size=p, stride=p)
    x = np.random.default_rng(5).standard_normal((1, 4, 4, 4, D)).astype(np.float32)
    with torch.no_grad():
        want = (
            tconv(torch.from_numpy(x).permute(0, 4, 1, 2, 3))
            .permute(0, 2, 3, 4, 1)
            .numpy()
        )
    w = tconv.state_dict()["weight"].numpy()  # (D, O, p, p, p)
    kernel = np.transpose(w, (2, 3, 4, 0, 1))  # (p,p,p,D,O), no flip
    up = UnpatchConv3D(O, p)
    got = up.apply(
        {"params": {"kernel": jnp.asarray(kernel),
                    "bias": jnp.asarray(tconv.state_dict()["bias"].numpy())}},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-4)


def test_patchconv_grid_fold_matches_explicit_concat():
    """append_grid must equal concatenating the reference's (x,y,t) grid
    channels at full resolution and patchifying (models/dpot.py:364,
    350-360): [x; grid] @ W == x @ W[:C] + grid @ W[C:]."""
    rng = np.random.default_rng(2)
    p, C, E, T, H = 4, 3, 8, 5, 16
    x = jnp.asarray(rng.standard_normal((2, H, H, T, C)), jnp.float32)
    pcg = PatchConv(E, p, append_grid=True)
    params = pcg.init(jax.random.key(0), x)  # kernel (p,p,C+3,E)
    got = pcg.apply(params, x)

    gx = jnp.linspace(0, 1, H)[None, :, None, None, None]
    gy = jnp.linspace(0, 1, H)[None, None, :, None, None]
    gt = jnp.linspace(0, 1, T)[None, None, None, :, None]
    grid = jnp.concatenate(
        [
            jnp.broadcast_to(gx, (2, H, H, T, 1)),
            jnp.broadcast_to(gy, (2, H, H, T, 1)),
            jnp.broadcast_to(gt, (2, H, H, T, 1)),
        ],
        axis=-1,
    )
    want = PatchConv(E, p).apply(params, jnp.concatenate([x, grid], axis=-1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_patchconv3d_grid_fold_matches_explicit_concat():
    """3D analogue: append_grid == concat of get_grid_4d channels
    (reference models/dpot3d.py:338-354)."""
    from dpot_tpu.models.dpot3d import PatchConv3D

    rng = np.random.default_rng(3)
    p, C, E, T, H = 2, 2, 6, 3, 8
    x = jnp.asarray(rng.standard_normal((2, H, H, H, T, C)), jnp.float32)
    pcg = PatchConv3D(E, p, append_grid=True)
    params = pcg.init(jax.random.key(0), x)  # kernel (p,p,p,C+4,E)
    got = pcg.apply(params, x)

    def axgrid(n, axis):
        shape = [1] * 6
        shape[axis] = n
        return jnp.broadcast_to(
            jnp.linspace(0, 1, n).reshape(shape), (2, H, H, H, T, 1)
        )

    grid = jnp.concatenate(
        [axgrid(H, 1), axgrid(H, 2), axgrid(H, 3), axgrid(T, 4)], axis=-1
    )
    want = PatchConv3D(E, p).apply(params, jnp.concatenate([x, grid], axis=-1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
