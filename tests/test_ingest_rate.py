"""On-disk ingest path: raw-memmap HDF5 readers, windowed train reads,
zero-intermediate batch assembly (fetch_into), and the rate bar that makes
it all matter — the loader must outrun the chip's sample consumption
(SURVEY §7 hard part (d); VERDICT r2 item 1).

Reference analogue: utils/griddataset.py:88-117 per-item reads feeding
torch DataLoader(num_workers=8) in train_temporal.py:108-109. This host
feeds the TPU from very few cores, so per-read constant costs (h5py
dispatch ~1 ms/read) are the budget the raw path exists to reclaim.
"""

import os
import time

import numpy as np
import pytest

from dpot_tpu.data.generation import generate_synthetic_corpus
from dpot_tpu.data.grid_dataset import MixedTemporalDataset
from dpot_tpu.data.loader import DataLoader
from dpot_tpu.data.raw_hdf5 import RawScatterReader, RawSingleReader, contiguous_layout


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Small on-disk scatter corpus at the pretraining item shape."""
    root = str(tmp_path_factory.mktemp("ingest"))
    generate_synthetic_corpus(
        root, name="ingest_t", n_train=48, n_test=4,
        in_size=(128, 128), t_total=21, n_channels=4,
    )
    old = os.environ.get("DPOT_DATA_ROOT")
    os.environ["DPOT_DATA_ROOT"] = root
    yield root
    if old is None:
        os.environ.pop("DPOT_DATA_ROOT", None)
    else:
        os.environ["DPOT_DATA_ROOT"] = old


def test_raw_reader_matches_h5py(corpus):
    """The memmap fast path must read byte-identical data to h5py, full
    and windowed, and the probe must detect the contiguous layout."""
    import h5py

    path = os.path.join(corpus, "ingest_t", "train")
    assert contiguous_layout(os.path.join(path, "data_0.hdf5")) is not None
    r = RawScatterReader(path)
    for idx in (0, 7):
        with h5py.File(os.path.join(path, f"data_{idx}.hdf5"), "r") as f:
            ref = f["data"][:]
        np.testing.assert_array_equal(r.read(idx), ref)
        np.testing.assert_array_equal(
            r.read(idx, tsel=slice(3, 14)), ref[..., 3:14, :]
        )
        # zero-copy view returns the same data
        np.testing.assert_array_equal(
            np.asarray(r.read(idx, tsel=slice(3, 14), copy=False)),
            ref[..., 3:14, :],
        )


def test_raw_single_reader_matches_h5py(tmp_path):
    import h5py

    from dpot_tpu.data.generation import write_single

    data = np.random.default_rng(0).standard_normal(
        (6, 16, 16, 8, 2)
    ).astype(np.float32)
    p = str(tmp_path / "single.hdf5")
    write_single(p, data)
    r = RawSingleReader(p)
    np.testing.assert_array_equal(r.read(3), data[3])
    np.testing.assert_array_equal(r.read(5, tsel=slice(2, 7)), data[5, ..., 2:7, :])


def test_raw_reader_falls_back_on_chunked(tmp_path):
    """Chunked/compressed layouts (foreign corpora) must take the h5py
    path and still read correctly."""
    import h5py

    data = np.arange(4 * 4 * 6 * 2, dtype=np.float32).reshape(4, 4, 6, 2)
    p = tmp_path / "data_0.hdf5"
    with h5py.File(p, "w") as f:
        f.create_dataset("data", data=data, chunks=(2, 2, 3, 1),
                         compression="gzip")
    assert contiguous_layout(str(p)) is None
    r = RawScatterReader(str(tmp_path))
    np.testing.assert_array_equal(r.read(0), data)
    np.testing.assert_array_equal(r.read(0, tsel=slice(1, 4)), data[..., 1:4, :])


def test_fetch_into_matches_getitem(corpus):
    """The zero-intermediate assembly path is bit-identical to
    __getitem__ under the same rng — including the fallback (non-identity
    resize) route."""
    for res in (128, 64):  # 128 = fast path (identity), 64 = fallback
        ds = MixedTemporalDataset(
            "ingest_t", res=res, t_in=10, t_ar=1, n_channels=4, train=True
        )
        for idx in (0, 13, 40):
            x, y, msk, cls = ds.__getitem__(idx, rng=np.random.default_rng(idx))
            ox = np.empty_like(x)
            oy = np.empty_like(y)
            om = np.empty_like(msk)
            c2 = ds.fetch_into(idx, ox, oy, om, np.random.default_rng(idx))
            np.testing.assert_array_equal(ox, x)
            np.testing.assert_array_equal(oy, y)
            np.testing.assert_array_equal(om, msk)
            assert c2 == cls


def test_loader_fast_path_matches_generic(corpus):
    """Loader output with fetch_into available == the generic stack path
    (same seed, same epoch)."""
    ds = MixedTemporalDataset(
        "ingest_t", res=128, t_in=10, t_ar=1, n_channels=4, train=True
    )

    class NoInto:
        def __init__(self, inner):
            self._inner = inner

        def __len__(self):
            return len(self._inner)

        def __getitem__(self, i, rng=None):
            return self._inner.__getitem__(i, rng=rng)

    fast = list(DataLoader(ds, batch_size=8, shuffle=True, num_workers=2,
                           seed=3))
    slow = list(DataLoader(NoInto(ds), batch_size=8, shuffle=True,
                           num_workers=2, seed=3))
    assert len(fast) == len(slow)
    # batch 0 seeds the fast path's slot shapes (generic route both ways);
    # later batches exercise fetch_into
    for bf, bs in zip(fast, slow):
        for a, b in zip(bf, bs):
            np.testing.assert_array_equal(a, b)


@pytest.fixture(scope="module")
def tm_corpus(tmp_path_factory):
    """The SAME synthetic trajectories as `corpus` (same dataset name →
    same per-index seeds) written in the time-major layout."""
    root = str(tmp_path_factory.mktemp("ingest_tm"))
    generate_synthetic_corpus(
        root, name="ingest_t", n_train=48, n_test=4,
        in_size=(128, 128), t_total=21, n_channels=4, time_major=True,
    )
    return root


def _with_root(root):
    old = os.environ.get("DPOT_DATA_ROOT")
    os.environ["DPOT_DATA_ROOT"] = root
    return old


def _restore_root(old):
    if old is None:
        os.environ.pop("DPOT_DATA_ROOT", None)
    else:
        os.environ["DPOT_DATA_ROOT"] = old


def test_time_major_corpus_roundtrip(corpus, tm_corpus):
    """Time-major files store the transposed trajectory, are tagged, and
    the reader windows the leading axis — data identical to the standard
    layout after the transpose."""
    from dpot_tpu.data.raw_hdf5 import is_time_major

    std = RawScatterReader(os.path.join(corpus, "ingest_t", "train"))
    tmp = os.path.join(tm_corpus, "ingest_t", "train")
    assert is_time_major(os.path.join(tmp, "data_0.hdf5"))
    tm = RawScatterReader(tmp)
    assert tm.time_major and not std.time_major
    for idx in (0, 11):
        ref = std.read(idx)  # (X, Y, T, C)
        np.testing.assert_array_equal(
            np.moveaxis(tm.read(idx), 0, -2), ref
        )
        np.testing.assert_array_equal(
            tm.read(idx, tsel=slice(2, 13)),
            np.moveaxis(ref[..., 2:13, :], -2, 0),
        )


def test_time_major_dataset_matches_standard(corpus, tm_corpus):
    """MixedTemporalDataset over a time-major corpus: __getitem__ returns
    the standard layout (host transpose), fetch_into ships time-major
    slots, and both agree with the standard-corpus dataset item-for-item
    (train AND test modes)."""
    old = _with_root(corpus)
    try:
        std_tr = MixedTemporalDataset("ingest_t", res=128, t_in=10, t_ar=1,
                                      n_channels=4, train=True)
        std_te = MixedTemporalDataset("ingest_t", res=128, t_in=10, t_ar=1,
                                      n_channels=4, train=False)
        _with_root(tm_corpus)
        tm_tr = MixedTemporalDataset("ingest_t", res=128, t_in=10, t_ar=1,
                                     n_channels=4, train=True)
        tm_te = MixedTemporalDataset("ingest_t", res=128, t_in=10, t_ar=1,
                                     n_channels=4, train=False)
    finally:
        _restore_root(old)
    assert tm_tr.time_major_batches and not std_tr.time_major_batches
    assert not tm_te.time_major_batches  # eval stays standard-layout

    for idx in (0, 17):
        xs, ys, ms, cs = std_tr.__getitem__(idx, rng=np.random.default_rng(idx))
        xt, yt, mt, ct = tm_tr.__getitem__(idx, rng=np.random.default_rng(idx))
        np.testing.assert_allclose(xt, xs, atol=1e-6)
        np.testing.assert_allclose(yt, ys, atol=1e-6)
        # fetch_into: time-major slots, transpose matches the std item
        tin, tar = 10, 1
        ox = np.empty((tin, 128, 128, 4), np.float32)
        oy = np.empty((tar, 128, 128, 4), np.float32)
        om = np.empty((128, 128, 1, 4), np.float32)
        tm_tr.fetch_into(idx, ox, oy, om, np.random.default_rng(idx))
        np.testing.assert_allclose(np.moveaxis(ox, 0, -2), xs, atol=1e-6)
        np.testing.assert_allclose(np.moveaxis(oy, 0, -2), ys, atol=1e-6)
        # test mode: identical standard-layout items either way
        xs, ys, _, _ = std_te.__getitem__(idx % 4)
        xt, yt, _, _ = tm_te.__getitem__(idx % 4)
        np.testing.assert_allclose(xt, xs, atol=1e-6)
        np.testing.assert_allclose(yt, ys, atol=1e-6)


def test_time_major_train_step_equivalence(corpus, tm_corpus):
    """A jitted train step consuming time-major batches produces the SAME
    loss and gradients-updated params as the standard-layout step on the
    same data (the device-side moveaxis is exact)."""
    import jax
    import jax.numpy as jnp

    from dpot_tpu.data.loader import DataLoader
    from dpot_tpu.models import build_model
    from dpot_tpu.train.optimizers import build_optimizer
    from dpot_tpu.train.state import TrainState
    from dpot_tpu.train.step import make_train_step

    def batches(root):
        old = _with_root(root)
        try:
            ds = MixedTemporalDataset("ingest_t", res=128, t_in=10, t_ar=1,
                                      n_channels=4, train=True)
            dl = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2,
                            seed=7)
            return ds, [next(iter(dl))]
        finally:
            _restore_root(old)

    std_ds, std_b = batches(corpus)
    tm_ds, tm_b = batches(tm_corpus)
    assert tm_ds.time_major_batches
    (xs, ys, mss, cs), (xt, yt, mst, ct) = std_b[0], tm_b[0]
    assert xt.shape == (4, 10, 128, 128, 4)  # time-major ships (B,T,H,W,C)
    np.testing.assert_allclose(np.moveaxis(xt, 1, -2), xs, atol=1e-6)

    model = build_model(
        "DPOT", img_size=128, patch_size=16, in_channels=4, in_timesteps=10,
        out_timesteps=1, embed_dim=32, depth=1, n_blocks=4, modes=4, n_cls=1,
    )
    params = model.init(jax.random.key(0), jnp.asarray(xs))
    tx = build_optimizer("adam", 1e-3, grad_clip=1.0)

    def run(step, x, y, msk, cls):
        state = TrainState.create(model.apply, params, tx, jax.random.key(1))
        state, aux = step(state, {
            "x": jnp.asarray(x), "y": jnp.asarray(y),
            "msk": jnp.asarray(msk), "cls": jnp.asarray(cls),
        })
        return float(jnp.reshape(aux["loss_step"], ()))

    l_std = run(make_train_step(t_bundle=1, noise_scale=0.0, donate=False),
                xs, ys, mss, cs)
    l_tm = run(
        make_train_step(t_bundle=1, noise_scale=0.0, donate=False,
                        time_major=True),
        xt, yt, mst, ct,
    )
    assert abs(l_std - l_tm) < 1e-5, (l_std, l_tm)


def test_time_major_is_faster(corpus, tm_corpus):
    """The contiguous time-major window copy must beat the strided
    T-inner one (measured ~2.3x; asserted loosely for CI robustness)."""
    def rate(root):
        old = _with_root(root)
        try:
            ds = MixedTemporalDataset("ingest_t", res=128, t_in=10, t_ar=1,
                                      n_channels=4, train=True)
        finally:
            _restore_root(old)
        shapes = ds.fast_item_shapes or (
            (128, 128, 10, 4), (128, 128, 1, 4), (128, 128, 1, 4)
        )
        x, y, m = (np.empty(s, np.float32) for s in shapes)
        rng = np.random.default_rng(0)
        for i in range(48):
            ds.fetch_into(i, x, y, m, rng)
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(48):
                ds.fetch_into(i, x, y, m, rng)
            best = max(best, 48 / (time.perf_counter() - t0))
        return best

    r_tm, r_std = rate(tm_corpus), rate(corpus)
    assert r_tm > r_std, (r_tm, r_std)


def test_loader_wire_dtype_matches_astype(tm_corpus):
    """DataLoader(x_dtype=bf16) — the wire cast folded into the assembly
    copy — must equal the f32 loader's output cast afterwards, bit for
    bit (same rounding: np.copyto and astype use the same conversion)."""
    import jax.numpy as jnp

    old = _with_root(tm_corpus)
    try:
        ds = MixedTemporalDataset("ingest_t", res=128, t_in=10, t_ar=1,
                                  n_channels=4, train=True)
    finally:
        _restore_root(old)
    f32 = list(DataLoader(ds, batch_size=8, shuffle=True, num_workers=1,
                          seed=7))
    b16 = list(DataLoader(ds, batch_size=8, shuffle=True, num_workers=1,
                          seed=7, x_dtype=jnp.bfloat16, y_dtype=jnp.bfloat16))
    assert len(f32) == len(b16)
    for (xf, yf, mf, cf), (xb, yb, mb, cb) in zip(f32, b16):
        assert xb.dtype == np.dtype(jnp.bfloat16), xb.dtype
        np.testing.assert_array_equal(xf.astype(jnp.bfloat16), xb)
        np.testing.assert_array_equal(yf.astype(jnp.bfloat16), yb)
        np.testing.assert_array_equal(mf, mb)
        np.testing.assert_array_equal(cf, cb)


def test_loader_rate_meets_ti_consumption(tm_corpus):
    """The FULL DataLoader over a time-major corpus must hit DPOT-Ti's
    measured sample consumption (189 steps/s x B=8 = 1512/s,
    BENCH_LADDER_r02.jsonl) on one core — the round-4 bar (VERDICT r3
    item 3). Levers that closed it (r3 was 0.74-0.84x): loader-side
    ones-mask elision, stateless window words instead of per-item
    Generator construction, cached per-file memmaps, prefetch=8 +
    gil_interval=1e-4 (see DataLoader docstring). Idle-host median is
    ~1812/s; best-of-6 trials tolerates scheduler interference."""
    old = _with_root(tm_corpus)
    try:
        ds = MixedTemporalDataset("ingest_t", res=128, t_in=10, t_ar=1,
                                  n_channels=4, train=True)
    finally:
        _restore_root(old)
    dl = DataLoader(ds, batch_size=8, shuffle=True, num_workers=1)
    for b in dl:
        pass  # warm: page cache, memmap cache, slot shapes
    # warm the CPU too: this VM's single vCPU ramps over the first seconds
    # of sustained load (trials measured 457 -> 956 -> 1403 back-to-back)
    a = np.random.standard_normal((512, 512)).astype(np.float32)
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 2.0:
        a @ a
    best = 0.0
    for _ in range(10):
        # the 48-file corpus makes one epoch ~30 ms; timing 10 epochs per
        # window keeps per-epoch costs (producer-thread start, pipeline
        # fill) at the same ~1% share they have on a real-sized corpus.
        # Best-of-10 with early exit: the VM's steal bursts randomly halve
        # individual windows (quiet-stretch capacity is 1600-1800+/s).
        t0 = time.perf_counter()
        n = 0
        for _ep in range(10):
            for b in dl:
                n += b[0].shape[0]
        best = max(best, n / (time.perf_counter() - t0))
        if best >= 1512:
            break  # bar met; don't burn suite time on more trials
    assert best >= 1512, (
        f"time-major loader {best:.0f} samples/s < DPOT-Ti consumption "
        "(1512/s) — Ti would be ingest-bound again"
    )


def test_channelless_3d_windows_time_axis(tmp_path):
    """Regression (round-3 review): a channel-less (X,Y,Z,T) scatter corpus
    must window T, not Z — the reader's old rank heuristic (ndim>=4 ⇒
    trailing channel axis) silently sliced Z planes and trained on
    corrupted geometry. n_spatial from DatasetSpec.ndim pins the axis."""
    from dpot_tpu.data.generation import write_scatter
    from dpot_tpu.data.grid_dataset import TemporalDataset3D
    from dpot_tpu.data.registry import DatasetSpec, register_dataset

    rng = np.random.default_rng(3)
    trajs = [rng.standard_normal((10, 10, 10, 14)).astype(np.float32)
             for _ in range(4)]
    base = str(tmp_path / "nochan3d")
    write_scatter(base, iter(trajs), "train")
    register_dataset(DatasetSpec(
        name="nochan3d", train_path="nochan3d/train",
        test_path="nochan3d/train", train_size=4, test_size=4,
        scatter_storage=True, t_test=2, t_in=6, t_total=14,
        in_size=(10, 10, 10), n_channels=1, downsample=(1, 1, 1),
    ))
    old = _with_root(str(tmp_path))
    try:
        ds = TemporalDataset3D("nochan3d", res=10, t_in=6, t_ar=1,
                               n_channels=1, train=True)
        for idx in (0, 3):
            item_rng = np.random.default_rng((5, idx))
            x, y, msk, _ = ds.__getitem__(idx, rng=item_rng)
            # x must be SOME contiguous 6-frame window of the trajectory's
            # T axis with full 10^3 geometry, y the following frame
            assert x.shape == (10, 10, 10, 6, 1) and y.shape == (10, 10, 10, 1, 1)
            found = False
            for s in range(14 - 6):
                if np.allclose(x[..., 0], trajs[idx][..., s : s + 6]):
                    np.testing.assert_allclose(
                        y[..., 0, 0], trajs[idx][..., s + 6], atol=1e-6
                    )
                    found = True
                    break
            assert found, "x is not a T-window of the source trajectory"
    finally:
        _restore_root(old)


def test_time_major_3d_dataset(tmp_path):
    """TemporalDataset3D over both layouts: items agree, fetch_into ships
    time-major slots whose transpose matches the standard item."""
    from dpot_tpu.data.grid_dataset import TemporalDataset3D

    roots = {}
    for tm in (False, True):
        root = str(tmp_path / ("tm" if tm else "std"))
        generate_synthetic_corpus(
            root, name="ing3d", n_train=6, n_test=2,
            in_size=(12, 12, 12), t_total=14, n_channels=3, time_major=tm,
        )
        roots[tm] = root

    def make(tm, train=True):
        old = _with_root(roots[tm])
        try:
            return TemporalDataset3D("ing3d", res=12, t_in=6, t_ar=1,
                                     n_channels=3, train=train)
        finally:
            _restore_root(old)

    std, tmd = make(False), make(True)
    assert tmd.time_major_batches and not std.time_major_batches
    assert tmd.fast_item_shapes == (
        (6, 12, 12, 12, 3), (1, 12, 12, 12, 3), (12, 12, 12, 1, 3)
    )
    for idx in (0, 4):
        xs, ys, ms, _ = std.__getitem__(idx, rng=np.random.default_rng(idx))
        xt, yt, mt, _ = tmd.__getitem__(idx, rng=np.random.default_rng(idx))
        np.testing.assert_allclose(xt, xs, atol=1e-6)
        np.testing.assert_allclose(yt, ys, atol=1e-6)
        ox = np.empty((6, 12, 12, 12, 3), np.float32)
        oy = np.empty((1, 12, 12, 12, 3), np.float32)
        om = np.empty((12, 12, 12, 1, 3), np.float32)
        tmd.fetch_into(idx, ox, oy, om, np.random.default_rng(idx))
        np.testing.assert_allclose(np.moveaxis(ox, 0, -2), xs, atol=1e-6)
        np.testing.assert_allclose(np.moveaxis(oy, 0, -2), ys, atol=1e-6)
        np.testing.assert_array_equal(om, np.ones_like(om))
    # test mode reads the full trajectory through the host transpose
    s_te, t_te = make(False, train=False), make(True, train=False)
    xs, ys, _, _ = s_te[0]
    xt, yt, _, _ = t_te[0]
    np.testing.assert_allclose(xt, xs, atol=1e-6)
    np.testing.assert_allclose(yt, ys, atol=1e-6)


def test_ingest_rate_exceeds_chip_consumption(corpus):
    """The warm-cache serial ingest rate must beat DPOT-M's measured
    sample consumption (~424 samples/s = 53 steps/s x B=8,
    BENCH_LADDER_r02.jsonl) with >=1.2x margin on ONE core — the loader's
    prefetch thread then overlaps this with the train step. DPOT-Ti
    (~1512/s) additionally needs the time-major corpus layout; the bench
    ladder's 'ingest' entry records both ratios
    (x_dpot_m_consumption / x_dpot_ti_consumption)."""
    ds = MixedTemporalDataset(
        "ingest_t", res=128, t_in=10, t_ar=1, n_channels=4, train=True
    )
    B = 8
    x = np.empty((B, 128, 128, 10, 4), np.float32)
    y = np.empty((B, 128, 128, 1, 4), np.float32)
    m = np.empty((B, 128, 128, 1, 4), np.float32)
    rng = np.random.default_rng(0)
    for i in range(48):  # warm the page cache
        ds.fetch_into(i, x[i % B], y[i % B], m[i % B], rng)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(48):
            ds.fetch_into(i, x[i % B], y[i % B], m[i % B], rng)
        best = max(best, 48 / (time.perf_counter() - t0))
    assert best >= 1.2 * 424, (
        f"serial ingest {best:.0f} samples/s < 1.2x DPOT-M consumption "
        "(509/s) — the input pipeline would starve the chip"
    )


def test_inline_ring_loader_matches_threaded(tm_corpus):
    """The r5 loader architecture (prefetch=0 inline mode + slot_ring
    recycled buffers + whole-batch native assembly fetch_many_into) must
    yield EXACTLY the threaded fresh-buffer loader's batches, across
    multiple epochs (ring reuse) and after an abandoned epoch (early
    break must not corrupt the persistent pool)."""
    old = _with_root(tm_corpus)
    try:
        ds = MixedTemporalDataset("ingest_t", res=128, t_in=10, t_ar=1,
                                  n_channels=4, train=True)
    finally:
        _restore_root(old)
    ref_dl = DataLoader(ds, batch_size=8, shuffle=True, num_workers=1,
                        seed=11)
    new_dl = DataLoader(ds, batch_size=8, shuffle=True, num_workers=1,
                        seed=11, prefetch=0, slot_ring=2)
    # abandon one epoch mid-way first: the pool must fully recover
    it = iter(new_dl)
    next(it)
    del it
    new_dl.set_epoch(0)
    for ep in range(3):
        ref = [
            tuple(np.array(a) for a in b) for b in ref_dl
        ]
        new = [
            tuple(np.array(a) for a in b) for b in new_dl
        ]
        assert len(ref) == len(new) > 0
        for rb, nb in zip(ref, new):
            for r, n in zip(rb, nb):
                np.testing.assert_array_equal(r, n)


def test_inline_ring_bf16_loader_matches(tm_corpus):
    """Wire-dtype fold through the native batched assembly: the inline +
    ring + bf16-slot loader equals the threaded f32 loader bf16-rounded
    (the native RNE is bit-exact with numpy casting)."""
    import jax.numpy as jnp

    old = _with_root(tm_corpus)
    try:
        ds = MixedTemporalDataset("ingest_t", res=128, t_in=10, t_ar=1,
                                  n_channels=4, train=True)
    finally:
        _restore_root(old)
    ref_dl = DataLoader(ds, batch_size=8, shuffle=True, num_workers=1,
                        seed=5)
    new_dl = DataLoader(ds, batch_size=8, shuffle=True, num_workers=1,
                        seed=5, prefetch=0, slot_ring=2,
                        x_dtype=jnp.bfloat16, y_dtype=jnp.bfloat16)
    for (xf, yf, mf, cf), (xb, yb, mb, cb) in zip(ref_dl, new_dl):
        assert xb.dtype == np.dtype(jnp.bfloat16)
        np.testing.assert_array_equal(
            xf.astype(jnp.bfloat16).view(np.uint16), xb.view(np.uint16)
        )
        np.testing.assert_array_equal(
            yf.astype(jnp.bfloat16).view(np.uint16), yb.view(np.uint16)
        )
        np.testing.assert_array_equal(mf, mb)
        np.testing.assert_array_equal(cf, cb)


def test_wire_loader_rate_bar(tm_corpus):
    """The r5 wire configuration (inline + slot_ring + bf16 assembly —
    what cli/train auto-selects for a bf16 run on a 1-worker host) must
    clear the threaded-f32 loader's r4 quiet-host MEDIAN (1812/s). Its
    quiet-host capacity is higher still (best measured 2619/s ≥ the
    2466/s ti8_scan8 demand; the loader now measures within noise of the
    raw memcpy+convert kernel, i.e. interpreter overhead is gone — see
    BASELINE.md §Ingest), but this VM's steal bursts make that ceiling
    un-pinnable as a deterministic test bar."""
    import jax.numpy as jnp

    old = _with_root(tm_corpus)
    try:
        ds = MixedTemporalDataset("ingest_t", res=128, t_in=10, t_ar=1,
                                  n_channels=4, train=True)
    finally:
        _restore_root(old)
    dl = DataLoader(ds, batch_size=8, shuffle=True, num_workers=1,
                    prefetch=0, slot_ring=2,
                    x_dtype=jnp.bfloat16, y_dtype=jnp.bfloat16)
    for b in dl:
        pass  # warm: page cache, memmaps, ring slots
    a = np.random.standard_normal((512, 512)).astype(np.float32)
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 2.0:
        a @ a
    best = 0.0
    for _ in range(10):
        t0 = time.perf_counter()
        n = 0
        for _ep in range(10):
            for b in dl:
                n += b[0].shape[0]
        best = max(best, n / (time.perf_counter() - t0))
        if best >= 1812:
            break
    assert best >= 1812, (
        f"wire loader {best:.0f} samples/s < the threaded loader's "
        "quiet-host median (1812/s) — the r5 architecture regressed"
    )
