"""Data layer tests: bilinear-resize parity with torch, mixture indexing
semantics (reference griddataset.py:54-56,133-140), padding/mask rules."""

import numpy as np
import torch
import torch.nn.functional as TF
import pytest

from dpot_tpu.data.registry import DATASET_DICT, make_synthetic_spec
from dpot_tpu.data.grid_dataset import MixedTemporalDataset
from dpot_tpu.data.loader import DataLoader
from dpot_tpu.data.resize import resize_linear_nd


@pytest.mark.parametrize("shape,out", [((13, 17), (8, 8)), ((8, 8), (16, 16)), ((64, 64), (128, 128))])
def test_bilinear_resize_matches_torch(shape, out):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((*shape, 3)).astype(np.float32)  # H, W, C
    got = resize_linear_nd(x, out)
    xt = torch.from_numpy(x).permute(2, 0, 1).unsqueeze(0)
    want = (
        TF.interpolate(xt, size=out, mode="bilinear")
        .squeeze(0)
        .permute(1, 2, 0)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_trilinear_resize_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((6, 7, 8, 2)).astype(np.float32)
    got = resize_linear_nd(x, (4, 4, 4))
    xt = torch.from_numpy(x).permute(3, 0, 1, 2).unsqueeze(0)
    want = (
        TF.interpolate(xt, size=(4, 4, 4), mode="trilinear")
        .squeeze(0)
        .permute(1, 2, 3, 0)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.fixture(scope="module")
def synth_specs():
    a = make_synthetic_spec("synth_a", train_size=10, test_size=4,
                            t_total=16, t_test=5, in_size=(24, 24), n_channels=2)
    b = make_synthetic_spec("synth_b", train_size=6, test_size=3,
                            t_total=16, t_test=5, in_size=(16, 16), n_channels=3)
    return a, b


def test_mixture_weighted_indexing(synth_specs):
    ds = MixedTemporalDataset(
        ["synth_a", "synth_b"], res=32, t_in=4, t_ar=2,
        data_weights=[2, 3], train=True,
    )
    # weighted sizes: 20 + 18 = 38
    assert len(ds) == 38
    # idx 0..19 -> dataset 0, data_idx = idx // 2
    assert ds.locate(0) == (0, 0)
    assert ds.locate(19) == (0, 9)
    # idx 20.. -> dataset 1, (idx-20) // 3
    assert ds.locate(20) == (1, 0)
    assert ds.locate(25) == (1, 1)
    assert ds.locate(37) == (1, 5)


def test_train_item_shapes_and_ones_padding(synth_specs):
    ds = MixedTemporalDataset(
        ["synth_a", "synth_b"], res=32, t_in=4, t_ar=2, train=True,
    )
    assert ds.n_channels == 3
    rng = np.random.default_rng(0)
    x, y, msk, cls = ds.__getitem__(0, rng=rng)  # from synth_a (2 channels)
    assert x.shape == (32, 32, 4, 3)
    assert y.shape == (32, 32, 2, 3)
    assert msk.shape == (32, 32, 1, 3)
    # channel 2 is ONES-padded (reference griddataset.py:98-99)
    np.testing.assert_allclose(x[..., 2], 1.0, atol=1e-6)
    assert (msk == 1).all()
    assert cls == 0


def test_test_item_mask_subsamples_resolution(synth_specs):
    ds = MixedTemporalDataset(
        ["synth_a"], res=48, t_in=4, n_channels=3, t_ar=-1, train=False,
    )
    x, y, msk, cls = ds[0]
    assert y.shape[-2] == DATASET_DICT["synth_a"].t_test
    # original res 24 -> stride 48//24 = 2; padded channel masked out
    assert msk[0, 0, 0, 0] == 1
    assert msk[1, 1, 0, 0] == 0
    assert (msk[..., 2] == 0).all()
    # count: 24*24 ones per real channel
    assert msk.sum() == 24 * 24 * 2


def test_loader_batches(synth_specs):
    ds = MixedTemporalDataset(["synth_a"], res=16, t_in=4, t_ar=1, train=True)
    dl = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2, seed=1)
    batches = list(dl)
    assert len(batches) == len(dl) == 3  # 10 samples / 4
    x, y, msk, cls = batches[0]
    assert x.shape == (4, 16, 16, 4, 2)
    assert cls.shape == (4,)
    # deterministic under the same seed/epoch counter
    dl2 = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2, seed=1)
    x2 = next(iter(dl2))[0]
    np.testing.assert_array_equal(x, x2)


def test_sharded_loader_rejects_indivisible_batch():
    """batch_size % num_shards != 0 would silently skip EVERY batch on the
    multi-host path; the loader must refuse it at construction."""
    import pytest

    from dpot_tpu.data import DataLoader

    class _DS:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            raise AssertionError("should not be reached")

    with pytest.raises(ValueError, match="num_shards"):
        DataLoader(_DS(), batch_size=8, num_shards=3, shard_index=0)


def test_loader_surfaces_producer_exception():
    """A failed read must raise in the consuming loop, not strand it in
    q.get() forever behind a dead producer thread."""
    import pytest

    from dpot_tpu.data.loader import DataLoader

    class BoomDataset:
        def __len__(self):
            return 16

        def __getitem__(self, idx):
            if idx >= 8:
                raise OSError("corrupt file")
            return (np.zeros((4, 4), np.float32),) * 3 + (np.int32(0),)

    dl = DataLoader(BoomDataset(), batch_size=8, shuffle=False, num_workers=2)
    with pytest.raises(OSError, match="corrupt file"):
        for _ in dl:
            pass


def test_copy_exact_rejects_broadcast():
    """fetch_into slot copies must reject shape mismatches instead of
    silently broadcasting a smaller item into a larger slot."""
    import pytest

    from dpot_tpu.data.grid_dataset import _copy_exact

    dst = np.zeros((4, 4, 10, 2), np.float32)
    with pytest.raises(ValueError, match="slot shape"):
        _copy_exact(dst, np.ones((4, 4, 1, 2), np.float32))
    _copy_exact(dst, np.ones((4, 4, 10, 2), np.float32))  # exact: fine
    assert dst.sum() == dst.size
