"""Native (C++) preprocessing library: build, parity vs numpy path,
throughput sanity."""

import time

import numpy as np
import pytest

from dpot_tpu.data.resize import resize_linear_nd
from dpot_tpu.native.build import native_available
from dpot_tpu.native.preprocess import (
    pad_data_2d,
    resize_bilinear_2d,
    resize_trilinear_3d,
)

needs_native = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


@needs_native
def test_native_resize_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((37, 41, 6)).astype(np.float32)
    got = resize_bilinear_2d(x, (64, 64))
    want = resize_linear_nd(x, (64, 64))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@needs_native
def test_native_pad_data_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((64, 64, 5, 2)).astype(np.float32)
    got = pad_data_2d(x, 128, 4)
    want = resize_linear_nd(x, (128, 128))
    want = np.concatenate([want, np.ones((128, 128, 5, 2), np.float32)], -1)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@needs_native
def test_native_trilinear_matches_numpy():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((9, 11, 13, 2)).astype(np.float32)
    got = resize_trilinear_3d(x, (16, 16, 16))
    want = resize_linear_nd(x, (16, 16, 16))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@needs_native
def test_native_identity_size():
    x = np.random.default_rng(3).standard_normal((32, 32, 4, 3)).astype(np.float32)
    got = pad_data_2d(x, 32, 3)
    np.testing.assert_allclose(got, x, atol=1e-6)


@needs_native
def test_native_faster_than_numpy():
    """The point of the native layer: beat numpy on the pipeline hot path."""
    rng = np.random.default_rng(4)
    x = rng.standard_normal((128, 128, 21, 4)).astype(np.float32)

    def timeit(fn, n=20):
        fn()  # warm
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        return (time.perf_counter() - t0) / n

    t_native = timeit(lambda: pad_data_2d(x, 128, 4))
    def np_path():
        y = resize_linear_nd(x, (128, 128))
        return y
    t_numpy = timeit(np_path)
    # native identity-resize path should not be slower than 2x numpy
    assert t_native < max(t_numpy * 2, 5e-3), (t_native, t_numpy)


def test_pad_data_2d_rejects_channel_truncation():
    """C > c_max must fail loudly on BOTH paths — the native kernel would
    write out of bounds (op[t*c_max + c] for c in [0,C)), the numpy path
    a shape error; neither silent corruption nor divergent behavior."""
    import pytest

    from dpot_tpu.native.preprocess import pad_data_2d

    x = np.zeros((8, 8, 3, 5), np.float32)
    with pytest.raises(ValueError, match="channels"):
        pad_data_2d(x, 16, 4)  # resize path
    with pytest.raises(ValueError, match="channels"):
        pad_data_2d(x, 8, 4)  # identity path
