"""FNO3d checkpoint-interop parity vs the actual reference model
(models/fno.py:346-435) — exercises the cfloat -> real-stacked spectral
weight split."""

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


def test_torch_to_jax_fno3d_forward_parity():
    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_fno3", os.path.join(REF, "models", "fno.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    torch.manual_seed(0)
    kw = dict(modes1=2, modes2=2, modes3=2, width=8, img_size=8,
              n_channels=2, in_timesteps=3, out_timesteps=1, n_layers=2)
    tmodel = mod.FNO3d(**kw).eval()

    x = np.random.default_rng(0).standard_normal((2, 8, 8, 8, 3, 2)).astype(
        np.float32
    )
    with torch.no_grad():
        ty = tmodel(torch.from_numpy(x))

    from dpot_tpu.models.fno import FNO3d
    from dpot_tpu.train.interop import fno3d_params_from_torch

    jmodel = FNO3d(**kw)
    params = jax.tree.map(
        jnp.asarray, fno3d_params_from_torch(tmodel.state_dict(), n_layers=2)
    )
    jy = jmodel.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jy), ty.numpy(), atol=2e-4, rtol=2e-3)
