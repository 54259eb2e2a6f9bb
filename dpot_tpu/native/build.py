"""Source-hash-cached native build + ctypes loader.

The TPU-side replacement for the reference's nvcc-JIT plugin infrastructure
(torch_utils/custom_ops.py:59-157 get_plugin, with its hash-based build
caching and FileBaton locking): compile native/*.cc with g++ into a shared
library keyed by a source digest, under ~/.cache/dpot_tpu, with an
flock-based build lock so concurrent workers don't race. Bindings are
plain ctypes (no pybind11 in this image).
"""

from __future__ import annotations

import ctypes
import fcntl
import hashlib
import os
import subprocess
from pathlib import Path
from typing import Optional

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SOURCES = [_REPO_ROOT / "native" / "preprocess.cc"]
_CACHE: dict[str, Optional[ctypes.CDLL]] = {}


def _cache_dir() -> Path:
    d = Path(
        os.environ.get(
            "DPOT_NATIVE_CACHE", os.path.expanduser("~/.cache/dpot_tpu")
        )
    )
    d.mkdir(parents=True, exist_ok=True)
    return d


_GXX_FLAGS = [
    "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", "-pthread",
]


def _digest() -> str:
    import platform

    h = hashlib.sha256()
    for src in _SOURCES:
        h.update(src.read_bytes())
    # flags and machine are part of the key: a -march=native .so built on
    # one host SIGILLs on an older one (CDLL load still succeeds, so the
    # loader's try/except would not catch it), and flag edits must not
    # silently reuse a stale library
    h.update(" ".join(_GXX_FLAGS).encode())
    h.update(platform.machine().encode())
    h.update(b"v1")
    return h.hexdigest()[:16]


def build_library(verbose: bool = False) -> Path:
    """Compile (if needed) and return the .so path."""
    so = _cache_dir() / f"dpot_native_{_digest()}.so"
    if so.exists():
        return so
    lock = _cache_dir() / "build.lock"
    with open(lock, "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)  # FileBaton equivalent
        if so.exists():
            return so
        tmp = so.with_suffix(".so.tmp")
        cmd = ["g++", *_GXX_FLAGS, *[str(s) for s in _SOURCES], "-o", str(tmp)]
        if verbose:
            print(" ".join(cmd))
        try:
            subprocess.run(cmd, check=True, capture_output=not verbose,
                           text=True)
        except subprocess.CalledProcessError as e:
            # surface the compiler error — a silent fallback to the numpy
            # path is a ~10-20x ingest slowdown with zero diagnostics
            print(
                "dpot_tpu native build FAILED (falling back to numpy "
                f"preprocessing):\n{e.stderr or e}", flush=True,
            )
            raise
        os.replace(tmp, so)
    return so


def get_library() -> Optional[ctypes.CDLL]:
    """Load (building on first use); returns None when no toolchain."""
    key = "lib"
    if key in _CACHE:
        return _CACHE[key]
    if os.environ.get("DPOT_DISABLE_NATIVE", "0") == "1":
        _CACHE[key] = None
        return None
    try:
        lib = ctypes.CDLL(str(build_library()))
    except Exception:
        _CACHE[key] = None
        return None

    i64 = ctypes.c_int64
    fp = ctypes.POINTER(ctypes.c_float)
    lib.resize_bilinear_2d.argtypes = [fp, fp, i64, i64, i64, i64, i64,
                                       ctypes.c_int]
    lib.pad_data_2d.argtypes = [fp, fp, i64, i64, i64, i64, i64, i64,
                                ctypes.c_int]
    lib.resize_trilinear_3d.argtypes = [fp, fp, i64, i64, i64, i64, i64, i64,
                                        i64, ctypes.c_int]
    _CACHE[key] = lib
    return lib


def native_available() -> bool:
    return get_library() is not None
