"""DPOTNet3D checkpoint-interop parity vs the actual reference model
(models/dpot3d.py:228-407): convert a randomly-initialized reference state
dict and require forward agreement — the 3D analogue of test_interop.py."""

import importlib.util
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mount unavailable"
)


def load_reference_dpot3d():
    spec = importlib.util.spec_from_file_location(
        "ref_dpot3d", os.path.join(REF, "models", "dpot3d.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("normalize", [False, True])
def test_torch_to_jax_3d_forward_parity(normalize):
    import torch

    ref = load_reference_dpot3d()
    torch.manual_seed(0)
    cfg = dict(
        img_size=16, patch_size=4, in_channels=2, out_channels=2,
        in_timesteps=3, out_timesteps=1, n_blocks=4, embed_dim=32,
        out_layer_dim=16, depth=2, modes=4, mlp_ratio=1.0, n_cls=3,
        normalize=normalize,
    )
    tmodel = ref.DPOTNet3D(**cfg).eval()

    x = np.random.default_rng(0).standard_normal(
        (2, 16, 16, 16, 3, 2)
    ).astype(np.float32)
    with torch.no_grad():
        ty = tmodel(torch.from_numpy(x))

    from dpot_tpu.models.dpot3d import DPOTNet3D
    from dpot_tpu.train.interop import dpot3d_params_from_torch

    jmodel = DPOTNet3D(**cfg)
    params = jax.tree.map(
        jnp.asarray,
        dpot3d_params_from_torch(
            tmodel.state_dict(), depth=2, normalize=normalize
        ),
    )
    jy = jmodel.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(jy), ty.numpy(), atol=2e-4, rtol=2e-3
    )
