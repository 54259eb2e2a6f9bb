"""Uniform-grid temporal datasets (host-side, numpy).

Port of the reference data layer semantics (utils/griddataset.py):

- MixedTemporalDataset (:27-174): weighted concatenation of named datasets;
  per sample: HDF5 read -> bilinear resize to res^2 -> pad channels to Cmax
  with ONES -> train: random start window (x=[t0,t0+t_in), y=next t_ar
  frames, all-ones mask) / test: full t_test trajectory + a mask that
  subsamples back to the original resolution and zeroes padded channels.
- TemporalDataset3D (:454-564): single-dataset 3D version (trilinear).

Feeds the TPU via numpy arrays; device transfer/sharding happens in the
training loop. Synthetic specs generate deterministic smooth trajectories
in memory (capability the reference lacks; used when no corpus is mounted).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import numpy as np

from dpot_tpu.data.registry import DATASET_DICT, DatasetSpec, get_spec
from dpot_tpu.data.resize import resize_linear_nd


def _open_sample_reader(spec: DatasetSpec, train: bool) -> Callable[..., np.ndarray]:
    """Reader for one dataset: (idx, tsel=None) -> raw sample array
    (spatial..., T[, C]) — tsel (a slice) restricts the time axis.

    Windowed reads are the ingest hot path (SURVEY §7 hard part (d)): a
    train item needs t_in+t_ar of t_total frames, so reading only the
    window cuts IO bytes and decode work ~2x at the standard 21-frame
    trajectories (the reference reads whole samples,
    utils/griddataset.py:141). HDF5 reads go through the raw-offset memmap
    fast path (data/raw_hdf5.py) when the corpus uses the framework's
    contiguous protocol."""
    if spec.synthetic:
        from dpot_tpu.data.raw_hdf5 import _window

        def read_synth(idx: int, tsel=None, copy: bool = True) -> np.ndarray:
            return _window(
                _synthetic_sample(spec, train, idx), tsel,
                n_spatial=spec.ndim,
            )

        return read_synth

    path = spec.resolve(train)
    # spec.ndim pins the time axis exactly (channel-less 3D / channeled 1D
    # corpora break the reader's rank heuristic otherwise)
    if spec.scatter_storage:
        from dpot_tpu.data.raw_hdf5 import RawScatterReader

        return RawScatterReader(path, n_spatial=spec.ndim).read
    from dpot_tpu.data.raw_hdf5 import RawSingleReader

    return RawSingleReader(path, n_spatial=spec.ndim).read


def _synthetic_sample(spec: DatasetSpec, train: bool, idx: int) -> np.ndarray:
    """Deterministic smooth pseudo-trajectory: low-frequency random field
    advected by a phase rotation in Fourier space."""
    # stable across processes (python's hash() is salted per process,
    # which would give every multi-host worker a different corpus)
    import zlib

    seed = zlib.crc32(
        f"{spec.name}|{bool(train)}|{int(idx)}".encode()
    ) % (2**31)
    rng = np.random.default_rng(seed)
    size = spec.in_size
    T, C = spec.t_total, spec.n_channels
    k = 6  # number of low-frequency modes per axis
    if len(size) == 2:
        H, W = size
        coef = rng.standard_normal((k, k, C)) + 1j * rng.standard_normal((k, k, C))
        omega = 2 * np.pi * rng.random((k, k, C)) * 0.05
        out = np.empty((H, W, T, C), dtype=np.float32)
        for t in range(T):
            ft = np.zeros((H, W, C), dtype=complex)
            ft[:k, :k] = coef * np.exp(1j * omega * t)
            out[..., t, :] = np.real(np.fft.ifft2(ft, axes=(0, 1))) * H
        return out
    H, W, L = size
    coef = rng.standard_normal((k, k, k, C)) + 1j * rng.standard_normal((k, k, k, C))
    omega = 2 * np.pi * rng.random((k, k, k, C)) * 0.05
    out = np.empty((H, W, L, T, C), dtype=np.float32)
    for t in range(T):
        ft = np.zeros((H, W, L, C), dtype=complex)
        ft[:k, :k, :k] = coef * np.exp(1j * omega * t)
        out[..., t, :] = np.real(np.fft.ifftn(ft, axes=(0, 1, 2))) * H
    return out


def _target_mask(x, size_orig, n_spatial: int) -> np.ndarray:
    """Resolution/channel target mask (reference griddataset.py:103-117):
    ones on the stride grid mapping the padded resolution back onto the
    raw one, zeros on padded channels. ONE implementation for the 2D
    temporal/steady and 3D datasets — a clamping/pred_channels fix here
    reaches all of them."""
    msk = np.zeros((*x.shape[:n_spatial], 1, x.shape[-1]), dtype=np.float32)
    strides = tuple(
        slice(None, None, max(x.shape[a] // size_orig[a], 1))
        for a in range(n_spatial)
    )
    msk[strides + (slice(None), slice(None, size_orig[-1]))] = 1.0
    return msk


def _draw_start(rng, hi: int) -> int:
    """Window-start draw from whatever randomness the caller supplies:
    a Generator (per-item streams, __getitem__ contract), a stateless
    uint64 word (the loader fast path — loader._window_words; a modulo of
    a 64-bit word over hi <= a few dozen has bias < 1e-17), a legacy
    RandomState, or None (module-global stream)."""
    if hi <= 1:
        return 0
    if isinstance(rng, (int, np.integer)):
        return int(int(rng) % hi)
    if rng is None:
        rng = np.random
    if isinstance(rng, np.random.Generator):
        return int(rng.integers(hi))
    return int(rng.randint(hi))


def _copy_exact(dst, src):
    """np.copyto with broadcasting DISABLED: batch slots are shaped from
    the first batch (loader fast path), so a later item of a different
    legitimate shape (e.g. mixed t_test across eval datasets) must fail
    loudly instead of silently broadcasting into the slot."""
    src = np.asarray(src)
    if tuple(src.shape) != tuple(dst.shape):
        raise ValueError(
            f"batch slot shape {tuple(dst.shape)} != item shape "
            f"{tuple(src.shape)}: items with mixed shapes cannot share one "
            "DataLoader's preallocated slots"
        )
    np.copyto(dst, src)


class MixedTemporalDataset:
    """Weighted multi-dataset mixture for pretraining
    (reference utils/griddataset.py:27-174)."""

    def __init__(
        self,
        data_names: Sequence[str] | str,
        n_list: Optional[Sequence[int]] = None,
        res: int = 128,
        t_in: int = 10,
        t_ar: int = 1,
        n_channels: Optional[int] = None,
        normalize: bool = False,
        train: bool = True,
        data_weights: Optional[Sequence[int]] = None,
    ):
        self.data_names = [data_names] if isinstance(data_names, str) else list(data_names)
        self.specs = [get_spec(n) for n in self.data_names]
        self.data_weights = (
            list(data_weights) if data_weights is not None else [1] * len(self.specs)
        )
        self.t_in = t_in
        self.t_ar = t_ar
        self.train = train
        # every train-mode mask in this data layer is all-ones (test-mode
        # masks subsample resolution / zero padded channels) — lets the
        # train loop skip the msk H2D transfer (make_train_step ones_mask)
        self.train_masks_are_ones = bool(train)
        self.res = res
        self.n_sizes = (
            list(n_list)
            if n_list is not None
            else [s.train_size if train else s.test_size for s in self.specs]
        )
        weighted = [s * w for s, w in zip(self.n_sizes, self.data_weights)]
        self.cumulative_sizes = np.cumsum(weighted)
        self.t_tests = [s.t_test for s in self.specs]
        self.downsamples = [s.downsample for s in self.specs]
        self.n_channels = (
            max(s.n_channels for s in self.specs)
            if n_channels is None
            else n_channels
        )
        self.readers = [_open_sample_reader(s, train) for s in self.specs]
        # stored-layout probes: time-major corpora ((T, sp..., C) per
        # trajectory, generation.write_scatter time_major=True) window as
        # ONE contiguous memmap copy. When EVERY member dataset is
        # time-major AND needs no per-item host transform, whole batches
        # ship to the device time-major and the train step undoes the
        # transpose there (~free on TPU vs ~1ms/sample of host strided
        # copy) — `time_major_batches` drives the loader slot shapes and
        # make_train_step(time_major=...). Callers may force it False
        # (e.g. spatial sharding expects (B,H,W,T,C) host layout).
        self._tmaj = [
            bool(getattr(getattr(r, "__self__", None), "time_major", False))
            for r in self.readers
        ]
        self.time_major_batches = (
            train
            and not normalize
            and all(self._tmaj)
            and all(
                tuple(s.in_size) == (res, res)
                and s.n_channels == self.n_channels
                and tuple(s.downsample) == (1, 1)
                and s.t_total >= t_in + t_ar
                for s in self.specs
            )
        )

        # per-dataset fetch_into fast-path eligibility, computed ONCE
        # (six attribute/tuple checks per item add up at the Ti ingest
        # bar of ~660 us/item)
        self._fast_ok = [
            train
            and not normalize
            and tuple(s.downsample) == (1, 1)
            and tuple(s.in_size) == (res, res)
            and s.n_channels == self.n_channels
            and s.t_total >= t_in + t_ar
            for s in self.specs
        ]
        self._win_his = [s.t_total - (t_in + t_ar) + 1 for s in self.specs]

        self.normalize = normalize
        self.normalizers: list = []
        if normalize:
            from dpot_tpu.utils.normalizer import UnitTransformer

            for i, s in enumerate(self.specs):
                n_fit = min(500, self.n_sizes[i])
                samples = np.stack([
                    self._std_layout(self.readers[i](j), i) for j in range(n_fit)
                ])
                self.normalizers.append(UnitTransformer(samples))

    def _std_layout(self, sample: np.ndarray, dataset_idx: int) -> np.ndarray:
        """(T, spatial..., C) -> (spatial..., T, C) for time-major corpora
        (time-major trajectories are always channeled — the writers
        require it); pass-through otherwise."""
        if self._tmaj[dataset_idx]:
            return np.moveaxis(sample, 0, -2)
        return sample

    def __len__(self) -> int:
        return int(self.cumulative_sizes[-1])

    @property
    def fast_item_shapes(self):
        """Per-item slot shapes for the loader's preallocated batch
        buffers, or None to let the loader learn them from the first
        (generic-path) batch. Non-None only for time-major batches, whose
        layout differs from what __getitem__ returns."""
        if not getattr(self, "time_major_batches", False):
            return None
        c, r = self.n_channels, self.res
        return (
            (self.t_in, r, r, c),
            (self.t_ar, r, r, c),
            (r, r, 1, c),
        )

    # -- reference pad_data (griddataset.py:88-101) --
    def pad_data(self, x: np.ndarray) -> np.ndarray:
        from dpot_tpu.native.preprocess import pad_data_2d

        # native fused resize+pad when the toolchain built it; numpy otherwise
        return pad_data_2d(x, self.res, self.n_channels)

    # -- reference get_target_mask (griddataset.py:103-117) --
    def get_target_mask(self, x: np.ndarray, size_orig: Sequence[int]) -> np.ndarray:
        return _target_mask(x, size_orig, 2)

    def locate(self, idx: int) -> tuple[int, int]:
        """Weighted mixture indexing (griddataset.py:133-140)."""
        if len(self.specs) == 1:  # common case: skip the searchsorted
            return 0, idx // self.data_weights[0]
        dataset_idx = int(np.searchsorted(self.cumulative_sizes, idx + 1))
        data_idx = idx if dataset_idx == 0 else idx - int(
            self.cumulative_sizes[dataset_idx - 1]
        )
        data_idx //= self.data_weights[dataset_idx]
        return dataset_idx, int(data_idx)

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None):
        dataset_idx, data_idx = self.locate(idx)
        spec = self.specs[dataset_idx]

        if self.train:
            # draw the window on the RAW trajectory (pad_data is
            # spatial-only, so T and hence the draw distribution are
            # identical to slicing after the pad — reference
            # griddataset.py:146-153), then read+resize ONLY the
            # t_in+t_ar kept frames: the windowed HDF5 read + windowed
            # resize halve the per-item ingest cost at t_total=21
            hi = max(spec.t_total - (self.t_in + self.t_ar) + 1, 1)
            start = _draw_start(rng, hi)
            win = slice(start, min(start + self.t_in + self.t_ar, spec.t_total))
            sample = np.asarray(
                self._std_layout(
                    self.readers[dataset_idx](data_idx, tsel=win), dataset_idx
                ),
                dtype=np.float32,
            )
            if sample.ndim == 3:  # augment channel dim
                sample = sample[..., None]
            sample = self.pad_data(sample)
            x = sample[..., : self.t_in, :]
            y = sample[..., self.t_in :, :]
            msk = np.ones((*x.shape[:2], 1, x.shape[-1]), dtype=np.float32)
        else:
            sample = np.asarray(
                self._std_layout(self.readers[dataset_idx](data_idx), dataset_idx),
                dtype=np.float32,
            )
            if sample.ndim == 3:
                sample = sample[..., None]
            orig_size = list(sample.shape)
            if spec.pred_channels is not None:
                orig_size[-1] = spec.pred_channels
            sample = self.pad_data(sample)
            x = sample[..., : self.t_in, :]
            y = sample[..., self.t_in : self.t_in + self.t_tests[dataset_idx], :]
            msk = self.get_target_mask(sample, orig_size)

        if self.normalize:
            # stats have a size-1 time axis and broadcast over the window
            # (the reference's per-window slice, griddataset.py:166, indexes
            # a size-1 axis and breaks for start>0; normalize=False is the
            # only exercised path there — here broadcasting makes it usable)
            nz = self.normalizers[dataset_idx]
            x = (x - nz.mean[0]) / (nz.std[0] + 1e-6)

        ds = self.downsamples[dataset_idx]
        if tuple(ds) != (1, 1):
            x, y = x[:: ds[0], :: ds[1]], y[:: ds[0], :: ds[1]]

        return x, y, msk, np.int32(dataset_idx)

    def fetch_into(self, idx: int, out_x, out_y, out_msk, rng) -> np.int32:
        """Zero-intermediate batch assembly (loader fast path): copy the
        windowed trajectory STRAIGHT from the corpus memmap into the
        caller's batch slots — one strided pass per sample instead of the
        generic path's three (memmap->item array, item->stack, ones msk).
        Falls back to __getitem__ + copy when any per-item transform
        (resize, normalize, downsample, channel pad, short trajectory)
        needs an intermediate. Semantically identical to __getitem__
        (same rng draw, same window); tests/test_ingest_rate.py checks
        exact equality."""
        dataset_idx, data_idx = self.locate(idx)
        fast = self._fast_ok[dataset_idx]
        tmaj_batch = self.time_major_batches
        if not fast or (self._tmaj[dataset_idx] and not tmaj_batch):
            # (a time-major item inside a standard-layout batch needs the
            # host transpose — generic route)
            x, y, msk, cls = self.__getitem__(idx, rng=rng)
            _copy_exact(out_x, x)
            _copy_exact(out_y, y)
            if out_msk is not None:
                _copy_exact(out_msk, msk)
            return cls
        start = _draw_start(rng, self._win_his[dataset_idx])
        win = slice(start, start + self.t_in + self.t_ar)
        sample = self.readers[dataset_idx](data_idx, tsel=win, copy=False)
        if tmaj_batch:
            # slots are time-major (t, res, res, C): the window is ONE
            # contiguous memmap range -> two sequential copies; the train
            # step transposes on device (make_train_step time_major=True)
            _copy_exact(out_x, sample[: self.t_in])
            _copy_exact(out_y, sample[self.t_in :])
            if out_msk is not None:
                out_msk[...] = 1.0
            return np.int32(dataset_idx)
        if sample.ndim == 3:
            sample = sample[..., None]
        _copy_exact(out_x, sample[..., : self.t_in, :])
        _copy_exact(out_y, sample[..., self.t_in :, :])
        if out_msk is not None:
            out_msk[...] = 1.0
        return np.int32(dataset_idx)

    def fetch_many_into(
        self, batch_ids, words, out_x, out_y, out_msk
    ) -> Optional[np.ndarray]:
        """Whole-batch assembly in ONE GIL-released native call
        (native/preprocess.cc assemble_windows_*): every item of a
        time-major batch is one contiguous f32 range of its trajectory
        memmap — x window immediately followed by the y window — so the
        per-item Python layer (fetch_into dispatch, two np.copyto passes,
        slot bookkeeping) collapses to collecting B source addresses.
        Returns the per-item cls array, or None when any item is
        ineligible (non-time-major, h5py fallback, masked variant) — the
        loader then runs its per-item path. Semantics are identical to
        fetch_into item-by-item (same window draw, same bf16 rounding —
        the native f32->bf16 is bit-exact with np.copyto's, pinned in
        tests/test_native_preprocess.py)."""
        if not self.time_major_batches:
            return None
        n = len(batch_ids)
        ptrs = np.empty(n, np.uint64)
        cls = np.empty(n, np.int32)
        views = []  # pin every source mapping alive across the call
        frame = None
        for j in range(n):
            d, data_idx = self.locate(int(batch_ids[j]))
            if not self._fast_ok[d]:
                return None
            start = _draw_start(words[j], self._win_his[d])
            win = slice(start, start + self.t_in + self.t_ar)
            sample = self.readers[d](data_idx, tsel=win, copy=False)
            if not (
                isinstance(sample, np.ndarray)
                and sample.dtype == np.float32
                and sample.flags.c_contiguous
            ):
                return None  # h5py fallback or foreign dtype: per-item path
            if frame is None:
                frame = sample.shape[1:]
            views.append(sample)
            ptrs[j] = sample.ctypes.data
            cls[j] = d
        if frame is None or (
            tuple(out_x.shape[1:]) != (self.t_in, *frame)
            or tuple(out_y.shape[1:]) != (self.t_ar, *frame)
        ):
            return None
        from dpot_tpu.native.preprocess import assemble_windows

        if not assemble_windows(ptrs, out_x, out_y):
            return None
        if out_msk is not None:
            out_msk[...] = 1.0
        del views
        return cls


class MixedMaskedDataset(MixedTemporalDataset):
    """Masked-prediction variant (reference utils/griddataset.py:182-336):
    the LAST input frame is blanked to -1 and the target is the unmasked
    window. Like the reference, this is capability surface — no entry
    script wires it in."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        # the masked item layout routes through __getitem__ (standard
        # layout) — never ship time-major batches
        self.time_major_batches = False

    def get_masked_input(self, x: np.ndarray) -> np.ndarray:
        x_new = x.copy()
        x_new[:, :, -1, :] = -1.0
        return x_new

    def fetch_into(self, idx: int, out_x, out_y, out_msk, rng) -> np.int32:
        # the masked item layout (x_msk, x, target_msk) differs from the
        # parent's (x, y, msk): route through __getitem__; the loader
        # still saves the stack pass
        x_msk, x, t_msk, cls = self.__getitem__(idx, rng=rng)
        _copy_exact(out_x, x_msk)
        _copy_exact(out_y, x)
        if out_msk is not None:
            _copy_exact(out_msk, t_msk)
        return cls

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None):
        dataset_idx, data_idx = self.locate(idx)
        if self.train:
            # windowed read+resize of just the t_in kept frames (see
            # MixedTemporalDataset.__getitem__)
            spec = self.specs[dataset_idx]
            hi = max(spec.t_total - self.t_in + 1, 1)
            start = _draw_start(rng, hi)
            win = slice(start, min(start + self.t_in, spec.t_total))
            x = np.asarray(
                self._std_layout(
                    self.readers[dataset_idx](data_idx, tsel=win), dataset_idx
                ),
                np.float32,
            )
            if x.ndim == 3:
                x = x[..., None]
            x = self.pad_data(x)
            x_msk = self.get_masked_input(x)
            target_msk = np.ones((*x.shape[:2], 1, x.shape[-1]), np.float32)
        else:
            sample = np.asarray(
                self._std_layout(self.readers[dataset_idx](data_idx), dataset_idx),
                dtype=np.float32,
            )
            if sample.ndim == 3:
                sample = sample[..., None]
            orig_size = list(sample.shape)
            sample = self.pad_data(sample)
            x_msk = self.get_masked_input(sample[..., : self.t_in, :])
            x = sample[
                ..., self.t_in - 1 : self.t_in + self.t_tests[dataset_idx], :
            ]
            target_msk = self.get_target_mask(sample, orig_size)

        ds = self.downsamples[dataset_idx]
        if tuple(ds) != (1, 1):
            x_msk = x_msk[:: ds[0], :: ds[1]]
            x = x[:: ds[0], :: ds[1]]
        return x_msk, x, target_msk, np.int32(dataset_idx)


class SteadyDataset2D:
    """Steady-state x -> y pairs from HDF5 fields 'x'/'y'
    (reference utils/griddataset.py:340-450)."""

    def __init__(
        self,
        data_name: str,
        n_train: Optional[int] = None,
        res: int = 128,
        n_channels: Optional[int] = None,
        train: bool = True,
    ):
        self.spec = get_spec(data_name)
        self.n_size = (
            n_train
            if n_train is not None
            else (self.spec.train_size if train else self.spec.test_size)
        )
        self.train = train
        # every train-mode mask in this data layer is all-ones (test-mode
        # masks subsample resolution / zero padded channels) — lets the
        # train loop skip the msk H2D transfer (make_train_step ones_mask)
        self.train_masks_are_ones = bool(train)
        self.res = res
        self.n_channels = (
            self.spec.n_channels if n_channels is None else n_channels
        )
        self.downsample = self.spec.downsample
        self._train = train
        self._readers: dict = {}

    def _read(self, idx: int, field: str) -> np.ndarray:
        if field not in self._readers:
            from dpot_tpu.data.raw_hdf5 import RawScatterReader, RawSingleReader

            path = self.spec.resolve(self._train)
            self._readers[field] = (
                RawScatterReader(path, field)
                if self.spec.scatter_storage
                else RawSingleReader(path, field)
            )
        return self._readers[field].read(idx)

    def pad_data(self, x: np.ndarray) -> np.ndarray:
        # (H, W, C) -> (res, res, 1, Cmax) with ONES channel pad
        x = resize_linear_nd(x, (self.res, self.res))[:, :, None, :]
        H, W, T, C = x.shape
        if C < self.n_channels:
            pad = np.ones((H, W, T, self.n_channels - C), dtype=x.dtype)
            x = np.concatenate([x, pad], axis=-1)
        return x

    def get_target_mask(self, x: np.ndarray, size_orig) -> np.ndarray:
        return _target_mask(x, size_orig, 2)

    def shuffle_channels(
        self, x: np.ndarray, y: np.ndarray, rng: np.random.Generator
    ) -> tuple[np.ndarray, np.ndarray]:
        """Channel-permutation augmentation (reference griddataset.py:
        SteadyDataset2D.shuffle_channels — swap two random channels in
        both input and target)."""
        i1, i2 = rng.permutation(x.shape[-1])[:2]
        x[..., [i1, i2]] = x[..., [i2, i1]]
        y[..., [i1, i2]] = y[..., [i2, i1]]
        return x, y

    def __len__(self) -> int:
        return int(self.n_size)

    def __getitem__(self, idx: int, rng=None):
        x = np.asarray(self._read(idx, "x"), np.float32)
        y = np.asarray(self._read(idx, "y"), np.float32)
        if x.ndim == 2:
            x, y = x[..., None], y[..., None]
        orig_size = list(y.shape)
        if self.spec.pred_channels is not None:
            # reference griddataset.py:432: the test mask keeps only the
            # channels the dataset declares predictable
            orig_size[-1] = self.spec.pred_channels
        x, y = self.pad_data(x), self.pad_data(y)
        msk = (
            np.ones((*x.shape[:2], 1, x.shape[-1]), np.float32)
            if self.train
            else self.get_target_mask(y, orig_size)
        )
        ds = self.downsample
        if tuple(ds) != (1, 1):
            x, y = x[:: ds[0], :: ds[1]], y[:: ds[0], :: ds[1]]
        return x, y, msk, np.int32(0)


class TemporalDataset3D:
    """Single-dataset 3D version (reference utils/griddataset.py:454-564)."""

    def __init__(
        self,
        data_name: str,
        n_train: Optional[int] = None,
        res: int = 128,
        t_in: int = 10,
        t_ar: int = 1,
        n_channels: Optional[int] = None,
        train: bool = True,
    ):
        self.spec = get_spec(data_name)
        self.n_size = (
            n_train
            if n_train is not None
            else (self.spec.train_size if train else self.spec.test_size)
        )
        self.train = train
        # every train-mode mask in this data layer is all-ones (test-mode
        # masks subsample resolution / zero padded channels) — lets the
        # train loop skip the msk H2D transfer (make_train_step ones_mask)
        self.train_masks_are_ones = bool(train)
        self.res = res
        self.t_in = t_in
        self.t_ar = t_ar
        self.t_test = self.spec.t_test
        self.n_channels = (
            self.spec.n_channels if n_channels is None else n_channels
        )
        self.downsample = self.spec.downsample
        self.reader = _open_sample_reader(self.spec, train)
        self._tmaj = bool(
            getattr(getattr(self.reader, "__self__", None), "time_major", False)
        )
        # see MixedTemporalDataset: time-major 3D windows are enormous
        # wins — a 128^3x(10+1)x5 window is 47MB/item, contiguous here vs
        # ~23k strided runs in the (X,Y,Z,T,C) layout
        self.time_major_batches = (
            train
            and self._tmaj
            and tuple(self.spec.in_size) == (res, res, res)
            and self.spec.n_channels == self.n_channels
            and tuple(self.spec.downsample) == (1, 1, 1)
            and self.spec.t_total >= t_in + t_ar
        )

    def _std_layout(self, sample: np.ndarray) -> np.ndarray:
        if self._tmaj:
            return np.moveaxis(sample, 0, -2)
        return sample

    @property
    def fast_item_shapes(self):
        if not self.time_major_batches:
            return None
        c, r = self.n_channels, self.res
        return (
            (self.t_in, r, r, r, c),
            (self.t_ar, r, r, r, c),
            (r, r, r, 1, c),
        )

    def fetch_into(self, idx: int, out_x, out_y, out_msk, rng) -> np.int32:
        """Zero-intermediate assembly (see MixedTemporalDataset.fetch_into)."""
        if not self.time_major_batches:
            x, y, msk, cls = self.__getitem__(idx, rng=rng)
            _copy_exact(out_x, x)
            _copy_exact(out_y, y)
            if out_msk is not None:
                _copy_exact(out_msk, msk)
            return cls
        hi = self.spec.t_total - (self.t_in + self.t_ar) + 1
        start = _draw_start(rng, hi)
        win = slice(start, start + self.t_in + self.t_ar)
        sample = self.reader(idx, tsel=win, copy=False)
        _copy_exact(out_x, sample[: self.t_in])
        _copy_exact(out_y, sample[self.t_in :])
        if out_msk is not None:
            out_msk[...] = 1.0
        return np.int32(0)

    def __len__(self) -> int:
        return int(self.n_size)

    def pad_data(self, x: np.ndarray) -> np.ndarray:
        from dpot_tpu.native.preprocess import resize_trilinear_3d

        x = resize_trilinear_3d(x, (self.res, self.res, self.res))
        *sp, T, C = x.shape
        if C < self.n_channels:
            pad = np.ones((*sp, T, self.n_channels - C), dtype=x.dtype)
            x = np.concatenate([x, pad], axis=-1)
        return x

    def get_target_mask(self, x: np.ndarray, size_orig: Sequence[int]) -> np.ndarray:
        return _target_mask(x, size_orig, 3)

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None):
        if self.train:
            # windowed read + trilinear-resize of ONLY the t_in+t_ar kept
            # frames — at 128^3x21x5 a full-trajectory read is 344MB/item;
            # the window cuts ingest bytes and resize work ~2x (see
            # MixedTemporalDataset.__getitem__)
            hi = max(self.spec.t_total - (self.t_in + self.t_ar) + 1, 1)
            start = _draw_start(rng, hi)
            win = slice(start, min(start + self.t_in + self.t_ar, self.spec.t_total))
            sample = np.asarray(
                self._std_layout(self.reader(idx, tsel=win)), dtype=np.float32
            )
            if sample.ndim == 4:
                sample = sample[..., None]
            sample = self.pad_data(sample)
            x = sample[..., : self.t_in, :]
            y = sample[..., self.t_in :, :]
            msk = np.ones((*x.shape[:3], 1, x.shape[-1]), dtype=np.float32)
        else:
            sample = np.asarray(self._std_layout(self.reader(idx)), dtype=np.float32)
            if sample.ndim == 4:
                sample = sample[..., None]
            orig_size = list(sample.shape)
            if self.spec.pred_channels is not None:
                orig_size[-1] = self.spec.pred_channels
            sample = self.pad_data(sample)
            x = sample[..., : self.t_in, :]
            y = sample[..., self.t_in : self.t_in + self.t_test, :]
            msk = self.get_target_mask(sample, orig_size)

        ds = self.downsample
        if tuple(ds) != (1, 1, 1):
            x, y = x[:: ds[0], :: ds[1], :: ds[2]], y[:: ds[0], :: ds[1], :: ds[2]]
        return x, y, msk, np.int32(0)
