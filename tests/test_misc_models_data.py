"""MLP/FourierMLP models + MixedMaskedDataset/SteadyDataset2D coverage."""

import numpy as np
import jax
import jax.numpy as jnp

from dpot_tpu.data.grid_dataset import MixedMaskedDataset
from dpot_tpu.data.registry import make_synthetic_spec
from dpot_tpu.models.mlp import MLP, FourierMLP


def test_mlp_forward():
    m = MLP(n_hidden=32, n_output=3, n_layers=2)
    x = jnp.ones((5, 7))
    p = m.init(jax.random.key(0), x)
    y = m.apply(p, x)
    assert y.shape == (5, 3)


def test_fourier_mlp_gaussian():
    m = FourierMLP(space_dim=2, theta_dim=1, output_size=3, fourier_dim=16)
    x = jnp.ones((5, 2))
    theta = jnp.ones((5, 1))
    p = m.init(jax.random.key(0), x, theta)
    y = m.apply(p, x, theta)
    assert y.shape == (5, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_fourier_mlp_exp_and_nofeat():
    m = FourierMLP(space_dim=2, fourier_dim=8, feature_type="exp")
    x = jnp.ones((4, 2))
    p = m.init(jax.random.key(0), x)
    assert m.apply(p, x).shape == (4, 3)
    m0 = FourierMLP(space_dim=2, fourier_dim=0)
    p0 = m0.init(jax.random.key(0), x)
    assert m0.apply(p0, x).shape == (4, 3)


def test_masked_dataset():
    make_synthetic_spec("synth_masked", train_size=6, test_size=3,
                        t_total=12, t_test=4, in_size=(16, 16), n_channels=2)
    ds = MixedMaskedDataset(["synth_masked"], res=16, t_in=5, train=True)
    rng = np.random.default_rng(0)
    x_msk, x, msk, cls = ds.__getitem__(0, rng=rng)
    assert x_msk.shape == (16, 16, 5, 2)
    # last frame blanked to -1 (reference griddataset.py:274-282)
    np.testing.assert_allclose(x_msk[:, :, -1, :], -1.0)
    np.testing.assert_array_equal(x_msk[:, :, :-1, :], x[:, :, :-1, :])

    ds_t = MixedMaskedDataset(["synth_masked"], res=16, t_in=5,
                              n_channels=2, train=False)
    x_msk, x, msk, _ = ds_t[0]
    assert x.shape[-2] == 1 + 4  # t_in-1 overlap + t_test
    np.testing.assert_allclose(x_msk[:, :, -1, :], -1.0)


def test_steady_dataset(tmp_path, monkeypatch):
    import h5py

    from dpot_tpu.data.grid_dataset import SteadyDataset2D
    from dpot_tpu.data.registry import DatasetSpec, register_dataset

    monkeypatch.setenv("DPOT_DATA_ROOT", str(tmp_path))
    rng = np.random.default_rng(0)
    with h5py.File(tmp_path / "steady.hdf5", "w") as f:
        f["x"] = rng.standard_normal((4, 12, 12, 2)).astype(np.float32)
        f["y"] = rng.standard_normal((4, 12, 12, 2)).astype(np.float32)
    register_dataset(DatasetSpec(
        name="steady_t", train_path="steady.hdf5", test_path="steady.hdf5",
        train_size=4, test_size=4, scatter_storage=False, t_test=1, t_in=1,
        t_total=1, in_size=(12, 12), n_channels=2, downsample=(1, 1),
    ))
    ds = SteadyDataset2D("steady_t", res=16, n_channels=3, train=True)
    x, y, msk, _ = ds[0]
    assert x.shape == (16, 16, 1, 3)
    assert y.shape == (16, 16, 1, 3)
    np.testing.assert_allclose(x[..., 2], 1.0)  # ONES channel pad
    # test split has the resolution/channel mask
    ds_t = SteadyDataset2D("steady_t", res=16, n_channels=3, train=False)
    _, _, msk, _ = ds_t[0]
    # 16//12 = 1 -> stride-1 mask over the full grid, padded channel zeroed
    assert (msk[..., 2] == 0).all() and msk.sum() == 16 * 16 * 2
    # channel-shuffle augmentation
    rng2 = np.random.default_rng(1)
    x2, y2 = ds.shuffle_channels(x.copy(), y.copy(), rng2)
    assert x2.shape == x.shape


def test_quantile_transformer_roundtrip():
    from dpot_tpu.utils.normalizer import QuantileTransformer

    rng = np.random.default_rng(2)
    X = rng.standard_normal((200, 4, 4, 2)).astype(np.float32) * 3 + 1
    qt = QuantileTransformer(X, n_quantiles=100)
    # inverse=True is the DEFAULT (denormalize), matching every other
    # transformer in the module; the forward direction is explicit
    z = qt.transform(X, inverse=False)
    assert 0.0 <= z.min() and z.max() <= 1.0
    back = qt.transform(z)
    np.testing.assert_allclose(back, X, atol=0.2, rtol=0.2)
    # NaN-robust fit (fit_quantiles under the hood)
    Xn = X.copy()
    Xn[0, 0, 0, 0] = np.nan
    qt2 = QuantileTransformer(Xn, n_quantiles=100)
    assert np.isfinite(qt2.quantiles).all()


def test_mlp_forward_parity_vs_reference():
    """Residual MLP forward parity vs the actual reference model
    (models/mlp.py:14-45) through mlp_params_from_torch."""
    import importlib.util
    import os

    import pytest as _pytest

    if not os.path.isdir("/root/reference"):
        _pytest.skip("reference mount unavailable")
    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_mlp_par", "/root/reference/models/mlp.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(0)
    tmodel = mod.MLP(n_input=4, n_hidden=32, n_output=3, n_layers=2).eval()
    x = np.random.default_rng(0).standard_normal((16, 4)).astype(np.float32)
    with torch.no_grad():
        ty = tmodel(torch.from_numpy(x))

    from dpot_tpu.models.mlp import MLP
    from dpot_tpu.train.interop import mlp_params_from_torch

    jmodel = MLP(n_hidden=32, n_output=3, n_layers=2)
    params = jax.tree.map(
        jnp.asarray, mlp_params_from_torch(tmodel.state_dict(), n_layers=2)
    )
    jy = jmodel.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jy), ty.numpy(), atol=1e-5, rtol=1e-4)


def test_fourier_mlp_forward_parity_vs_reference():
    """FourierMLP forward parity vs the ACTUAL reference model
    (models/mlp.py:74-132) — gaussian and exp feature types; B and both
    sub-MLPs copied from the torch module (the sin/cos 2pi factors,
    concat order, and logspace frequencies are numerics that deserve a
    golden, per CLAUDE.md)."""
    import sys

    import torch

    sys.path.insert(0, "/root/reference")
    from models.mlp import FourierMLP as RefFourierMLP

    from dpot_tpu.train.interop import mlp_params_from_torch

    rng = np.random.default_rng(4)
    x = rng.standard_normal((5, 2)).astype(np.float32)
    theta = rng.standard_normal((5, 1)).astype(np.float32)

    for ftype in ("gaussian", "exp"):
        torch.manual_seed(0)
        ref = RefFourierMLP(
            space_dim=2, theta_dim=1, output_size=3, n_layers=2,
            n_hidden=16, fourier_dim=8, type=ftype, sigma=1.5,
        ).eval()
        with torch.no_grad():
            want = ref(torch.from_numpy(x), torch.from_numpy(theta)).numpy()

        model = FourierMLP(
            space_dim=2, theta_dim=1, output_size=3, n_layers=2,
            n_hidden=16, fourier_dim=8, feature_type=ftype, sigma=1.5,
        )
        variables = model.init(
            jax.random.key(0), jnp.asarray(x), jnp.asarray(theta)
        )
        params = {
            "params": {
                "theta_mlp": mlp_params_from_torch(
                    ref.theta_mlp.state_dict(), 3
                )["params"],
                "mlp": mlp_params_from_torch(ref.mlp.state_dict(), 2)["params"],
            }
        }
        if ftype == "gaussian":
            params["constants"] = {"B": ref.B.detach().numpy()}
        elif "constants" in variables:
            params["constants"] = variables["constants"]
        got = np.asarray(
            model.apply(params, jnp.asarray(x), jnp.asarray(theta))
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5,
                                   err_msg=ftype)
