"""Autoregressive-rollout parity for the non-flagship families (DPOT3D,
CDPOT) vs the actual reference models — completes the parity matrix
(DPOT 2D rollout parity lives in test_rollout_parity.py)."""

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


def _load(modname, fname):
    sys.path.insert(0, REF)
    try:
        spec = importlib.util.spec_from_file_location(
            modname, os.path.join(REF, "models", fname)
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(REF)
    return mod


def test_dpot3d_rollout_parity():
    import torch

    ref = _load("ref_dpot3d_roll", "dpot3d.py")
    torch.manual_seed(0)
    cfg = dict(
        img_size=8, patch_size=2, in_channels=2, out_channels=2,
        in_timesteps=3, out_timesteps=1, n_blocks=4, embed_dim=32,
        out_layer_dim=16, depth=2, modes=3, mlp_ratio=1.0, n_cls=2,
    )
    tmodel = ref.DPOTNet3D(**cfg).eval()
    x0 = np.random.default_rng(0).standard_normal((1, 8, 8, 8, 3, 2)).astype(
        np.float32
    )
    n_steps = 5
    with torch.no_grad():
        xt = torch.from_numpy(x0)
        traj = []
        for _ in range(n_steps):
            im = tmodel(xt)
            traj.append(im.numpy())
            xt = torch.cat([xt[..., 1:, :], im], dim=-2)
    t_traj = np.concatenate(traj, axis=-2)

    from dpot_tpu.models.dpot3d import DPOTNet3D
    from dpot_tpu.train.interop import dpot3d_params_from_torch

    jmodel = DPOTNet3D(**cfg)
    params = jax.tree.map(
        jnp.asarray, dpot3d_params_from_torch(tmodel.state_dict(), depth=2)
    )
    xj = jnp.asarray(x0)
    preds = []
    for _ in range(n_steps):
        im = jmodel.apply(params, xj)
        preds.append(np.asarray(im))
        xj = jnp.concatenate([xj[..., 1:, :], im], axis=-2)
    j_traj = np.concatenate(preds, axis=-2)

    rel = np.linalg.norm(j_traj - t_traj) / np.linalg.norm(t_traj)
    assert rel < 1e-3, rel


def test_cdpot_rollout_parity():
    import torch

    ref = _load("ref_cdpot_roll", "dpot_res.py")
    torch.manual_seed(0)
    cfg = dict(
        img_size=32, patch_size=4, in_channels=2, out_channels=2,
        in_timesteps=4, out_timesteps=1, n_blocks=4, embed_dim=32,
        out_layer_dim=16, depth=2, modes=4, mlp_ratio=1.0, n_cls=2,
    )
    tmodel = ref.CDPOTNet(**cfg).eval()
    x0 = np.random.default_rng(1).standard_normal((1, 32, 32, 4, 2)).astype(
        np.float32
    )
    n_steps = 5
    with torch.no_grad():
        xt = torch.from_numpy(x0)
        traj = []
        for _ in range(n_steps):
            im, _ = tmodel(xt)
            traj.append(im.numpy())
            xt = torch.cat([xt[..., 1:, :], im], dim=-2)
    t_traj = np.concatenate(traj, axis=-2)

    from dpot_tpu.models.cdpot import CDPOTNet
    from dpot_tpu.train.interop import cdpot_params_from_torch

    jmodel = CDPOTNet(**cfg)
    params = jax.tree.map(
        jnp.asarray, cdpot_params_from_torch(tmodel.state_dict(), depth=2)
    )
    xj = jnp.asarray(x0)
    preds = []
    for _ in range(n_steps):
        im, _ = jmodel.apply(params, xj)
        preds.append(np.asarray(im))
        xj = jnp.concatenate([xj[..., 1:, :], im], axis=-2)
    j_traj = np.concatenate(preds, axis=-2)

    rel = np.linalg.norm(j_traj - t_traj) / np.linalg.norm(t_traj)
    assert rel < 1e-3, rel
