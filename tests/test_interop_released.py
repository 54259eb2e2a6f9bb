"""Released-config interop gate (VERDICT r1 item 8).

The toy-shape interop tests (test_interop.py, test_rollout_parity.py) pin
the converter mechanics; this gate runs the SAME parity checks at the real
released DPOT-Ti/S operating points — 128^2 grid, patch 8, modes 32, the
depth/width/n_blocks from the reference's configs/pretrain_tiny.yaml:62-80
and configs/pretrain_s.yaml — so the HF-weight path is proven at the shapes
it will actually be used at (BASELINE.md acceptance bar). Runs in the
default suite (~20 s: reference torch-CPU forwards at 128^2 dominate).
"""

import importlib.util
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = [
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference mount unavailable"),
]

# (preset, embed_dim, depth, n_blocks, mlp_ratio) from the reference's
# pretrain task grids (configs/pretrain_tiny.yaml, configs/pretrain_s.yaml)
RELEASED = {
    "Ti": dict(embed_dim=512, depth=4, n_blocks=4, mlp_ratio=1.0),
    "S": dict(embed_dim=1024, depth=6, n_blocks=8, mlp_ratio=1.0),
}
COMMON = dict(
    img_size=128, patch_size=8, in_channels=4, out_channels=4,
    in_timesteps=10, out_timesteps=1, out_layer_dim=32, modes=32,
    n_cls=12, normalize=False,
)


def _load_reference_dpot():
    spec = importlib.util.spec_from_file_location(
        "ref_dpot_released", os.path.join(REF, "models", "dpot.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _build_pair(preset):
    import torch

    ref = _load_reference_dpot()
    cfg = {**COMMON, **RELEASED[preset]}
    torch.manual_seed(0)
    tmodel = ref.DPOTNet(**cfg).eval()

    from dpot_tpu.models import build_model
    from dpot_tpu.train.interop import dpot_params_from_torch

    jmodel = build_model("DPOT", preset=preset, **COMMON)
    # the registry preset must agree with the reference task grid
    for k, v in RELEASED[preset].items():
        assert getattr(jmodel, k) == v, (preset, k, getattr(jmodel, k), v)
    params = jax.tree.map(
        jnp.asarray,
        dpot_params_from_torch(
            tmodel.state_dict(), depth=cfg["depth"], normalize=False
        ),
    )
    return tmodel, jmodel, params


@pytest.mark.parametrize("preset", ["Ti", "S"])
def test_released_shape_forward_parity(preset):
    import torch

    tmodel, jmodel, params = _build_pair(preset)
    x = np.random.default_rng(0).standard_normal((2, 128, 128, 10, 4)).astype(
        np.float32
    )
    with torch.no_grad():
        ty, tcls = tmodel(torch.from_numpy(x))
    jy, jcls = jmodel.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jy), ty.numpy(), atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(jcls), tcls.numpy(), atol=2e-4, rtol=2e-3
    )


def test_released_shape_rollout_parity():
    """8-step AR rollout at the released Ti operating point, trajectory
    rel-L2 <= 1e-3 (evaluate.py:183-216 feedback semantics)."""
    import torch

    tmodel, jmodel, params = _build_pair("Ti")
    n_steps, t_bundle = 8, 1
    x0 = np.random.default_rng(1).standard_normal((1, 128, 128, 10, 4)).astype(
        np.float32
    )
    with torch.no_grad():
        xt = torch.from_numpy(x0)
        t_preds = []
        for _ in range(n_steps):
            im, _ = tmodel(xt)
            t_preds.append(im.numpy())
            xt = torch.cat([xt[..., t_bundle:, :], im], dim=-2)
    t_traj = np.concatenate(t_preds, axis=-2)

    from dpot_tpu.train.step import make_eval_rollout

    roll = make_eval_rollout(t_bundle=t_bundle)
    out = roll(
        jmodel.apply, params,
        {
            "x": jnp.asarray(x0),
            "y": jnp.zeros((1, 128, 128, n_steps, 4), jnp.float32),
            "msk": jnp.ones((1, 128, 128, 1, 4), jnp.float32),
        },
    )
    j_traj = np.asarray(out["pred"])
    rel = np.linalg.norm(j_traj - t_traj) / np.linalg.norm(t_traj)
    assert rel < 1e-3, rel
