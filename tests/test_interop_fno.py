"""FNO2d checkpoint-interop parity vs the actual reference model
(models/fno.py:85-283): convert a randomly-initialized reference state
dict and require forward agreement (incl. the +-modes corner spectral
conv, patchified lift, ln layers, cls head)."""

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


def load_reference_fno():
    spec = importlib.util.spec_from_file_location(
        "ref_fno", os.path.join(REF, "models", "fno.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("use_ln,normalize", [(False, False), (True, True)])
def test_torch_to_jax_fno2d_forward_parity(use_ln, normalize):
    import torch

    ref = load_reference_fno()
    torch.manual_seed(0)
    kw = dict(modes1=4, modes2=4, width=16, img_size=32, n_channels=2,
              in_timesteps=3, out_timesteps=1, n_layers=2, patch_size=4,
              n_cls=3, use_ln=use_ln, normalize=normalize)
    tmodel = ref.FNO2d(**kw).eval()

    x = np.random.default_rng(0).standard_normal((2, 32, 32, 3, 2)).astype(
        np.float32
    )
    with torch.no_grad():
        ty, tcls = tmodel(torch.from_numpy(x))

    from dpot_tpu.models.fno import FNO2d
    from dpot_tpu.train.interop import fno2d_params_from_torch

    jmodel = FNO2d(**kw)
    params = jax.tree.map(
        jnp.asarray,
        fno2d_params_from_torch(
            tmodel.state_dict(), n_layers=2, normalize=normalize,
            use_ln=use_ln,
        ),
    )
    jy, jcls = jmodel.apply(params, jnp.asarray(x))
    # reference returns (B, h, w, T_out, C) at latent resolution for p>1
    np.testing.assert_allclose(np.asarray(jy), ty.numpy(), atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(jcls), tcls.numpy(), atol=2e-4, rtol=2e-3)
