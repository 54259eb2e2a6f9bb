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
