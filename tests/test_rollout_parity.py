"""Full autoregressive-rollout parity vs the reference implementation:
convert a reference DPOTNet's weights, roll both models out for several
steps feeding back their own predictions (evaluate.py:183-216 semantics),
and require trajectory-level agreement — the round-trip gate behind the
'nRMSE within 1e-3 of reference' target (BASELINE.md)."""

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


def test_autoregressive_rollout_parity():
    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_dpot_roll", os.path.join(REF, "models", "dpot.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    torch.manual_seed(0)
    T_in, T_bundle, n_steps = 6, 1, 8
    tmodel = mod.DPOTNet(
        img_size=32, patch_size=4, in_channels=2, out_channels=2,
        in_timesteps=T_in, out_timesteps=T_bundle, n_blocks=4, embed_dim=32,
        out_layer_dim=16, depth=2, modes=8, n_cls=3, normalize=True,
    ).eval()

    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((2, 32, 32, T_in, 2)).astype(np.float32)

    # reference rollout (evaluate.py:183-216): predict, slide window
    with torch.no_grad():
        xt = torch.from_numpy(x0)
        t_preds = []
        for _ in range(n_steps):
            im, _ = tmodel(xt)
            t_preds.append(im.numpy())
            xt = torch.cat([xt[..., T_bundle:, :], im], dim=-2)
    t_traj = np.concatenate(t_preds, axis=-2)

    # ours, with converted weights, via the jitted scan rollout
    from dpot_tpu.models.dpot import DPOTNet
    from dpot_tpu.train.interop import dpot_params_from_torch
    from dpot_tpu.train.step import make_eval_rollout

    jmodel = DPOTNet(
        img_size=32, patch_size=4, in_channels=2, out_channels=2,
        in_timesteps=T_in, out_timesteps=T_bundle, n_blocks=4, embed_dim=32,
        out_layer_dim=16, depth=2, modes=8, n_cls=3, normalize=True,
    )
    params = jax.tree.map(
        jnp.asarray,
        dpot_params_from_torch(tmodel.state_dict(), depth=2, normalize=True),
    )
    roll = make_eval_rollout(t_bundle=T_bundle)
    out = roll(
        jmodel.apply, params,
        {
            "x": jnp.asarray(x0),
            "y": jnp.zeros((2, 32, 32, n_steps, 2), jnp.float32),
            "msk": jnp.ones((2, 32, 32, 1, 2), jnp.float32),
        },
    )
    j_traj = np.asarray(out["pred"])

    # trajectory-level relative L2 between implementations
    rel = np.linalg.norm(j_traj - t_traj) / np.linalg.norm(t_traj)
    assert rel < 1e-3, rel
    np.testing.assert_allclose(j_traj, t_traj, atol=5e-3, rtol=5e-2)
