"""Dataset-generation protocol: writers round-trip through the real HDF5
read path of MixedTemporalDataset (no synthetic shortcut)."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from dpot_tpu.data.generation import (
    generate_synthetic_corpus,
    split_train_test,
    stack_pdebench_ns2d,
    write_scatter,
    write_single,
)
from dpot_tpu.data.grid_dataset import MixedTemporalDataset


def test_split_train_test():
    tr, te = split_train_test(100)
    assert len(tr) == 90 and len(te) == 10
    assert te[0] == 90


def test_stack_pdebench_ns2d(tmp_path):
    B, T, X, Y = 3, 5, 8, 8
    src = tmp_path / "raw.hdf5"
    rng = np.random.default_rng(0)
    with h5py.File(src, "w") as f:
        for k in ["Vx", "Vy", "density", "pressure"]:
            f[k] = rng.standard_normal((B, T, X, Y)).astype(np.float32)
    with h5py.File(src, "r") as f:
        data = stack_pdebench_ns2d(f)
    assert data.shape == (B, X, Y, T, 4)


def test_corpus_roundtrip_through_hdf5_read_path(tmp_path, monkeypatch):
    monkeypatch.setenv("DPOT_DATA_ROOT", str(tmp_path))
    generate_synthetic_corpus(
        str(tmp_path), name="gen_rt", n_train=6, n_test=3,
        in_size=(16, 16), t_total=14, n_channels=2,
    )
    # registry entry is now a REAL on-disk scatter dataset
    ds = MixedTemporalDataset(["gen_rt"], res=16, t_in=4, t_ar=2, train=True)
    assert not ds.specs[0].synthetic
    rng = np.random.default_rng(0)
    x, y, msk, cls = ds.__getitem__(0, rng=rng)
    assert x.shape == (16, 16, 4, 2)
    assert y.shape == (16, 16, 2, 2)

    ds_t = MixedTemporalDataset(["gen_rt"], res=16, t_in=4, t_ar=-1,
                                n_channels=2, train=False)
    x, y, msk, _ = ds_t[0]
    assert y.shape[-2] == ds.specs[0].t_test


def test_write_single_roundtrip(tmp_path):
    data = np.random.default_rng(1).standard_normal((4, 8, 8, 5, 1)).astype(
        np.float32
    )
    path = tmp_path / "single.hdf5"
    write_single(str(path), data)
    with h5py.File(path, "r") as f:
        np.testing.assert_array_equal(f["data"][:], data)


def test_stack_pdebench_ns3d_channel_order(tmp_path):
    """3D NS channel order is [Vx,Vy,Vz,PRESSURE,DENSITY] — the reference
    stacks pressure before density for 3D (preprocess.py:233), opposite
    to its own 2D order. A swapped corpus silently mis-trains/mis-evals
    against reference-converted data."""
    import h5py

    from dpot_tpu.data.generation import stack_pdebench_ns3d

    rng = np.random.default_rng(0)
    path = tmp_path / "ns3d.h5"
    fields = {
        k: rng.standard_normal((2, 3, 4, 4, 4)).astype(np.float32)
        for k in ("Vx", "Vy", "Vz", "density", "pressure")
    }
    with h5py.File(path, "w") as f:
        for k, v in fields.items():
            f[k] = v
    with h5py.File(path, "r") as f:
        data = stack_pdebench_ns3d(f)
    assert data.shape == (2, 4, 4, 4, 3, 5)
    np.testing.assert_array_equal(
        data[..., 3], fields["pressure"].transpose(0, 2, 3, 4, 1)
    )
    np.testing.assert_array_equal(
        data[..., 4], fields["density"].transpose(0, 2, 3, 4, 1)
    )


def test_stack_pdebench_scalar_group_layout(tmp_path):
    """Real SWE/DR raw corpora store one group per sample
    ('0000/data'...) — the stacker must read that layout (reference
    preprocess.py:136-141), and convert_pdebench must use the reference's
    arange split (train = first n_train, test = the NEXT n_test)."""
    import h5py

    from dpot_tpu.data.generation import convert_pdebench

    rng = np.random.default_rng(1)
    path = tmp_path / "swe.h5"
    samples = rng.standard_normal((6, 3, 4, 4)).astype(np.float32)
    with h5py.File(path, "w") as f:
        for i in range(6):
            f[f"{i:04d}/data"] = samples[i]
    nt, nv = convert_pdebench(
        str(path), str(tmp_path / "out"), kind="swe", n_train=4, n_test=2
    )
    assert (nt, nv) == (4, 2)
    with h5py.File(tmp_path / "out" / "train" / "data_0.hdf5") as f:
        np.testing.assert_array_equal(
            f["data"][:], samples[0].transpose(1, 2, 0)[..., None]
        )
    # test split starts at sample n_train (arange semantics), not at 90%
    with h5py.File(tmp_path / "out" / "test" / "data_0.hdf5") as f:
        np.testing.assert_array_equal(
            f["data"][:], samples[4].transpose(1, 2, 0)[..., None]
        )


def test_write_scatter_time_major_1d_and_channelless_guard(tmp_path):
    """Channeled 1D (X,T,C) trajectories ARE valid time-major corpora;
    channel-less data is ambiguous (moveaxis would silently move a
    spatial axis) and must be rejected."""
    import pytest

    from dpot_tpu.data.generation import write_scatter

    traj = np.zeros((8, 5, 2), np.float32)  # (X, T, C)
    n = write_scatter(str(tmp_path / "d1"), [traj], "train", time_major=True)
    assert n == 1
    import h5py

    with h5py.File(tmp_path / "d1" / "train" / "data_0.hdf5") as f:
        assert f["data"].shape == (5, 8, 2)  # (T, X, C)
        assert f["data"].attrs["layout"] == "t_major"

    with pytest.raises(AssertionError, match="channel"):
        write_scatter(
            str(tmp_path / "d2"), [np.zeros((8, 5), np.float32)], "train",
            time_major=True,
        )
