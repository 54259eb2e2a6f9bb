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
