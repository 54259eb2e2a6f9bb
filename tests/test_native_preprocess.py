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


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
def test_assemble_windows_f32_exact():
    """Batched window assembly (native/preprocess.cc assemble_windows_f32)
    is a bit-exact memcpy: item j's x/y rows reproduce the source range
    [0, x_elems) / [x_elems, x_elems+y_elems)."""
    from dpot_tpu.native.preprocess import assemble_windows

    rng = np.random.default_rng(0)
    xe, ye, n = 1003, 117, 5
    srcs = [
        np.ascontiguousarray(rng.standard_normal(xe + ye), np.float32)
        for _ in range(n)
    ]
    ptrs = np.array([s.ctypes.data for s in srcs], np.uint64)
    x = np.empty((n, xe), np.float32)
    y = np.empty((n, ye), np.float32)
    assert assemble_windows(ptrs, x, y)
    for j, s in enumerate(srcs):
        np.testing.assert_array_equal(x[j], s[:xe])
        np.testing.assert_array_equal(y[j], s[xe:])


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
def test_assemble_windows_bf16_bit_exact_with_ml_dtypes():
    """The native f32->bf16 conversion (AVX-512 RNE + NT stores where
    available) must be BIT-exact with numpy/ml_dtypes casting — the wire
    fold otherwise changes train numerics vs the generic loader path.
    Covers specials (inf/NaN quietening), f32 denormals that round to
    bf16 denormals (the case vcvtneps2bf16's forced DAZ would break),
    and 32B-misaligned destination rows (scalar head/tail)."""
    import ml_dtypes

    from dpot_tpu.native.preprocess import assemble_windows

    rng = np.random.default_rng(1)
    vals = np.concatenate([
        (rng.standard_normal(100003).astype(np.float32)
         * np.float32(10.0) ** rng.uniform(-44, 38, 100003).astype(np.float32)),
        np.array([0.0, -0.0, np.inf, -np.inf, np.nan, -np.nan,
                  1e-45, -1e-45, 1e-39, -1e-39, 5e-41,
                  3.3895314e38, 65504.0, 1.0000001, 0.99999994], np.float32),
    ])
    ref = vals.astype(ml_dtypes.bfloat16).view(np.uint16)
    # odd row length => row 1+ starts 32B-misaligned: exercises head/tail
    for xe in (len(vals), 4097):
        v = vals[:xe]
        src = np.ascontiguousarray(np.concatenate([v, v[:3]]), np.float32)
        ptrs = np.array([src.ctypes.data] * 3, np.uint64)
        bx = np.empty((3, xe), ml_dtypes.bfloat16)
        by = np.empty((3, 3), ml_dtypes.bfloat16)
        assert assemble_windows(ptrs, bx, by)
        for j in range(3):
            np.testing.assert_array_equal(bx[j].view(np.uint16), ref[:xe])
            np.testing.assert_array_equal(
                by[j].view(np.uint16), ref[:3]
            )
