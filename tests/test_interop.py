"""Checkpoint-interop parity: convert a randomly-initialized REFERENCE
DPOTNet state dict (imported from the read-only reference mount) and verify
our model reproduces its forward outputs within tight tolerance — the
SURVEY.md §7 hard part (c) gate for loading the released HF weights."""

import importlib.util
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mount not available"
)


def load_reference_dpot():
    spec = importlib.util.spec_from_file_location(
        "ref_dpot", os.path.join(REF, "models", "dpot.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("normalize", [False, True])
def test_torch_to_jax_forward_parity(normalize):
    import torch

    ref = load_reference_dpot()
    torch.manual_seed(0)
    tmodel = ref.DPOTNet(
        img_size=32, patch_size=4, in_channels=3, out_channels=3,
        in_timesteps=6, out_timesteps=2, n_blocks=4, embed_dim=32,
        out_layer_dim=16, depth=2, modes=8, mlp_ratio=1.0, n_cls=5,
        normalize=normalize,
    ).eval()

    x = np.random.default_rng(0).standard_normal((2, 32, 32, 6, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        ty, tcls = tmodel(torch.from_numpy(x))

    from dpot_tpu.models.dpot import DPOTNet
    from dpot_tpu.train.interop import dpot_params_from_torch

    jmodel = DPOTNet(
        img_size=32, patch_size=4, in_channels=3, out_channels=3,
        in_timesteps=6, out_timesteps=2, n_blocks=4, embed_dim=32,
        out_layer_dim=16, depth=2, modes=8, mlp_ratio=1.0, n_cls=5,
        normalize=normalize,
    )
    params = dpot_params_from_torch(
        tmodel.state_dict(), depth=2, normalize=normalize
    )
    jy, jcls = jmodel.apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(jy), ty.numpy(), atol=2e-4, rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(jcls), tcls.numpy(), atol=2e-4, rtol=2e-3
    )


def test_conv_transpose_semantics():
    """Pin the torch ConvTranspose2d -> flax ConvTranspose kernel mapping
    (spatial flip + (I,O) transpose) on its own."""
    import torch
    import flax.linen as nn

    torch.manual_seed(1)
    tconv = torch.nn.ConvTranspose2d(3, 5, kernel_size=4, stride=4)
    x = np.random.default_rng(1).standard_normal((2, 8, 8, 3)).astype(np.float32)
    with torch.no_grad():
        ty = tconv(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)

    from dpot_tpu.train.interop import _conv_transpose

    fconv = nn.ConvTranspose(5, kernel_size=(4, 4), strides=(4, 4), padding="VALID")
    # helper expects '<prefix>.weight' keys
    sd = {".weight": tconv.state_dict()["weight"], ".bias": tconv.state_dict()["bias"]}
    p = _conv_transpose(sd, "")
    jy = fconv.apply(
        {"params": {"kernel": jnp.asarray(p["kernel"]), "bias": jnp.asarray(p["bias"])}},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(jy), ty.numpy(), atol=1e-5, rtol=1e-4)


def test_inflate_2d_to_3d():
    from dpot_tpu.models.dpot import DPOTNet
    from dpot_tpu.models.dpot3d import DPOTNet3D
    from dpot_tpu.train.interop import inflate_2d_to_3d

    m2 = DPOTNet(
        img_size=16, patch_size=4, in_channels=2, out_channels=2,
        in_timesteps=3, embed_dim=32, depth=2, n_blocks=4, modes=4,
    )
    m3 = DPOTNet3D(
        img_size=8, patch_size=4, in_channels=2, out_channels=2,
        in_timesteps=3, embed_dim=32, depth=2, n_blocks=4, modes=4,
        temporal_modes=2,
    )
    p2 = m2.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3, 2)))
    p3 = m3.init(jax.random.key(1), jnp.zeros((1, 8, 8, 8, 3, 2)))
    merged, copied = inflate_2d_to_3d(p3, p2)
    # AFNO + MLP weights carried over
    assert any("filter/w1" in c for c in copied)
    assert any("mlp_fc1/kernel" in c for c in copied)
    assert any(c.startswith("time_agg") for c in copied)
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["blocks_0"]["filter"]["w1"]),
        np.asarray(jax.device_get(p2["params"]["blocks_0"]["filter"]["w1"])),
    )
    # the 3D model still runs with inflated params
    y = m3.apply(jax.tree.map(jnp.asarray, merged), jnp.zeros((1, 8, 8, 8, 3, 2)))
    assert y.shape == (1, 8, 8, 8, 1, 2)
