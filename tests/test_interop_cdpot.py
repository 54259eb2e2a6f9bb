"""CDPOTNet checkpoint-interop parity vs the actual reference model
(models/dpot_res.py:393-603): convert a randomly-initialized reference
state dict and require forward agreement — exercises the trunk AND the
CNO-specific pieces (filtered-activation patch embed, CNOBlock head)."""

import importlib.util
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mount unavailable"
)


def load_reference_cdpot():
    sys.path.insert(0, REF)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_dpot_res", os.path.join(REF, "models", "dpot_res.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(REF)
    return mod


@pytest.mark.parametrize("normalize", [False, True])
def test_torch_to_jax_cdpot_forward_parity(normalize):
    import torch

    ref = load_reference_cdpot()
    torch.manual_seed(0)
    cfg = dict(
        img_size=32, patch_size=4, in_channels=2, out_channels=2,
        in_timesteps=3, out_timesteps=1, n_blocks=4, embed_dim=32,
        out_layer_dim=16, depth=2, modes=4, mlp_ratio=1.0, n_cls=3,
        normalize=normalize,
    )
    tmodel = ref.CDPOTNet(**cfg).eval()

    x = np.random.default_rng(0).standard_normal((2, 32, 32, 3, 2)).astype(
        np.float32
    )
    with torch.no_grad():
        ty, tcls = tmodel(torch.from_numpy(x))

    from dpot_tpu.models.cdpot import CDPOTNet
    from dpot_tpu.train.interop import cdpot_params_from_torch

    jmodel = CDPOTNet(**cfg)
    params = jax.tree.map(
        jnp.asarray,
        cdpot_params_from_torch(
            tmodel.state_dict(), depth=2, normalize=normalize
        ),
    )
    jy, jcls = jmodel.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jy), ty.numpy(), atol=5e-4, rtol=5e-3)
    np.testing.assert_allclose(np.asarray(jcls), tcls.numpy(), atol=5e-4, rtol=5e-3)
