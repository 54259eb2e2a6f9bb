"""Tracing / profiling utilities.

The reference's observability is wall-clock deltas + a timing decorator
(SURVEY.md §5: train_temporal.py:182-183, utils/utilities.py:78-86,
torch_utils/misc.py:117-125 profiled_function). TPU equivalents here:
jax.profiler trace annotations, a timing decorator that fences the device,
AverageMeter, and a step-timer context that works on backends where
rank-0 transfers are unimplemented.
"""

from __future__ import annotations

import contextlib
import functools
import os
import time
from typing import Optional

import jax
import numpy as np


def fence(x) -> float:
    """Force device completion via a (1,1) value fetch and return the first
    element as a float. Works for arrays of any shape.

    This is THE device->host fence for this codebase (bench.py, train/loop,
    tools/profile_step all use it): rank-0 transfers are UNIMPLEMENTED on
    the tunneled TPU backend and block_until_ready does not reliably fence
    there, so fetching a real (1,1) value is the only dependable barrier."""
    import jax.numpy as jnp

    return float(np.asarray(jnp.reshape(x, (-1,))[:1].reshape(1, 1))[0, 0])


def host_fetch(tree):
    """Fetch a pytree of device arrays to host numpy, rank-0-safely:
    scalar leaves (train step counters, optimizer counts) travel via a
    (1,1) reshape — rank-0 D2H transfers are unimplemented on the tunneled
    TPU backend (same workaround as fence). numpy/python leaves pass
    through untouched (no pointless H2D round-trip). Cross-process-SHARDED
    leaves (multihost FSDP/TP states) are all-gathered to every host — a
    COLLECTIVE, so multihost callers must invoke host_fetch on all
    processes symmetrically (train/checkpoint.save_checkpoint does). THE
    helper for full host snapshots/checkpoint payloads; keep the
    workarounds in one place."""
    import jax.numpy as jnp

    def get(a):
        if isinstance(a, (np.ndarray, np.generic)) or not hasattr(a, "ndim"):
            return a
        if (
            isinstance(a, jax.Array)
            and not a.is_fully_addressable
            and not a.is_fully_replicated
        ):
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(a))
        if a.ndim == 0:
            return np.asarray(jnp.reshape(a, (1, 1))).reshape(()).copy()
        return np.asarray(jax.device_get(a))

    return jax.tree.map(get, tree)


def maybe_enable_compilation_cache() -> None:
    """Opt-in persistent XLA compilation cache (DPOT_COMPILE_CACHE=<dir>).

    First compiles over the tunneled TPU take 20-40s+ per program; the
    persistent cache makes repeat CLI invocations (train/evaluate/bench on
    unchanged configs) start near-instantly. Env-gated because the cache
    dir must be writable and per-machine."""
    cache_dir = os.environ.get("DPOT_COMPILE_CACHE")
    if not cache_dir:
        return
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax: silently skip


def timing(fn):
    """Reference `timing` decorator (utils/utilities.py:78-86), device-aware."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        # fence by FETCHING a value — block_until_ready does not reliably
        # fence on the tunneled TPU backend (this module's own fence())
        leaves = [a for a in jax.tree.leaves(out) if hasattr(a, "ndim")]
        if leaves:
            fence(leaves[0])
        print(f"{fn.__name__} took {time.perf_counter() - t0:.6f}s")
        return out

    return wrapped


def profiled_function(fn):
    """torch_utils/misc.py:117-125 equivalent: annotate the function in
    jax.profiler traces."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.profiler.TraceAnnotation(fn.__name__):
            return fn(*args, **kwargs)

    return wrapped


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class AverageMeter:
    """Reference AverageMeter (utils/utilities.py)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class EpochTimer:
    """Bucketed wall-clock accounting (load/train/test) matching the
    reference per-epoch printout (train_temporal.py:182-183,247-248)."""

    def __init__(self):
        self.buckets: dict[str, float] = {}
        self._t = time.perf_counter()

    def tick(self, bucket: str):
        now = time.perf_counter()
        self.buckets[bucket] = self.buckets.get(bucket, 0.0) + (now - self._t)
        self._t = now

    def get(self, bucket: str) -> float:
        return self.buckets.get(bucket, 0.0)


def count_parameters(params) -> int:
    """Parameter count, doubling complex leaves (reference
    utils/utilities.py:89-96 counts complex params twice)."""
    total = 0
    for p in jax.tree.leaves(params):
        n = int(np.prod(np.shape(p)))
        if np.iscomplexobj(p):
            n *= 2
        total += n
    return total
