"""numpy-facing wrappers over the native preprocessing library, with
automatic fallback to the pure-numpy path (dpot_tpu/data/resize.py)."""

from __future__ import annotations

import ctypes
import os

import numpy as np

from dpot_tpu.native.build import get_library

_FP = ctypes.POINTER(ctypes.c_float)


def _threads() -> int:
    return int(os.environ.get("DPOT_NATIVE_THREADS", os.cpu_count() or 1))


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(_FP)


def resize_bilinear_2d(x: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """(H, W, ...trailing) -> (oh, ow, ...trailing)."""
    if tuple(x.shape[:2]) == tuple(out_hw):
        # identity resize: skip the bilinear pass (same short-circuit as
        # the sibling wrappers; ingest hot path)
        return np.ascontiguousarray(x, np.float32)
    lib = get_library()
    H, W = x.shape[:2]
    trail = x.shape[2:]
    if lib is None:
        from dpot_tpu.data.resize import resize_linear_nd

        return resize_linear_nd(x, out_hw)
    xin = np.ascontiguousarray(x, np.float32)
    F = int(np.prod(trail)) if trail else 1
    out = np.empty((out_hw[0], out_hw[1], *trail), np.float32)
    lib.resize_bilinear_2d(
        _ptr(xin), _ptr(out), H, W, F, out_hw[0], out_hw[1], _threads()
    )
    return out


def pad_data_2d(x: np.ndarray, res: int, c_max: int) -> np.ndarray:
    """(H, W, T, C) -> (res, res, T, c_max), ONES channel padding."""
    H, W, T, C = x.shape
    if C > c_max:
        # the native kernel writes op[t*c_max + c] for c in [0, C) — with
        # C > c_max that is OUT OF BOUNDS (heap corruption); the numpy
        # path would raise a shape error. Fail identically on both.
        raise ValueError(
            f"sample has {C} channels > c_max={c_max}; channel TRUNCATION "
            "is not a supported conversion (slice the corpus instead)"
        )
    if (H, W) == (res, res):
        # identity resize: skip the whole bilinear pass (the common case —
        # pretraining reads 128^2 corpora at res=128; ingest hot path)
        if C == c_max:
            return np.ascontiguousarray(x, np.float32)
        pad = np.ones((H, W, T, c_max - C), np.float32)
        return np.concatenate([np.asarray(x, np.float32), pad], axis=-1)
    lib = get_library()
    if lib is None:
        from dpot_tpu.data.resize import resize_linear_nd

        y = resize_linear_nd(x, (res, res))
        if C < c_max:
            pad = np.ones((res, res, T, c_max - C), np.float32)
            y = np.concatenate([y, pad], axis=-1)
        return y
    xin = np.ascontiguousarray(x, np.float32)
    out = np.empty((res, res, T, c_max), np.float32)
    lib.pad_data_2d(_ptr(xin), _ptr(out), H, W, T, C, res, c_max, _threads())
    return out


def resize_trilinear_3d(x: np.ndarray, out_size: tuple[int, int, int]) -> np.ndarray:
    """(H, W, L, ...trailing) -> out_size + trailing."""
    H, W, L = x.shape[:3]
    if (H, W, L) == tuple(out_size):
        # identity resize: skip the trilinear pass (ingest hot path)
        return np.ascontiguousarray(x, np.float32)
    lib = get_library()
    trail = x.shape[3:]
    if lib is None:
        from dpot_tpu.data.resize import resize_linear_nd

        return resize_linear_nd(x, out_size)
    xin = np.ascontiguousarray(x, np.float32)
    F = int(np.prod(trail)) if trail else 1
    out = np.empty((*out_size, *trail), np.float32)
    lib.resize_trilinear_3d(
        _ptr(xin), _ptr(out), H, W, L, F, out_size[0], out_size[1],
        out_size[2], _threads(),
    )
    return out


def assemble_windows(
    src_ptrs: np.ndarray, out_x: np.ndarray, out_y: np.ndarray
) -> bool:
    """Batched contiguous-window assembly (the ingest fast path's fast
    path; native/preprocess.cc assemble_windows_*): src_ptrs is a uint64
    array of per-item f32 source addresses, each pointing at
    x_elems-then-y_elems contiguous floats of a pinned-alive trajectory
    memmap; rows of out_x/out_y ((B, ...) C-contiguous, float32 or
    ml_dtypes bfloat16) are filled in ONE GIL-released call. Returns False
    when the native library is unavailable or the dtype is unsupported —
    the caller (data/loader.py) falls back to the per-item path.

    CALLER CONTRACT: the arrays backing src_ptrs must stay referenced for
    the duration of the call, and each pointer must have x_elems + y_elems
    readable floats."""
    lib = get_library()
    if lib is None:
        return False
    n = len(src_ptrs)
    if n == 0:
        return True
    x_elems = int(np.prod(out_x.shape[1:]))
    y_elems = int(np.prod(out_y.shape[1:]))
    assert out_x.flags.c_contiguous and out_y.flags.c_contiguous
    assert src_ptrs.dtype == np.uint64 and out_x.dtype == out_y.dtype
    pp = src_ptrs.ctypes.data_as(ctypes.POINTER(ctypes.c_void_p))
    if out_x.dtype == np.float32:
        lib.assemble_windows_f32(
            pp, _ptr(out_x), _ptr(out_y), n, x_elems, y_elems, _threads()
        )
        return True
    if out_x.dtype.itemsize == 2 and out_x.dtype.kind == "V" or (
        out_x.dtype.name == "bfloat16"
    ):
        u16 = ctypes.POINTER(ctypes.c_uint16)
        lib.assemble_windows_bf16(
            pp,
            out_x.ctypes.data_as(u16),
            out_y.ctypes.data_as(u16),
            n, x_elems, y_elems, _threads(),
        )
        return True
    return False
