"""Device mesh + sharding helpers.

This replaces the reference's distributed runtime (HF Accelerate / torch DDP
/ NCCL, train_temporal_parallel.py:102,185,244,294-297 and the
`accelerate launch` plumbing in parallel_trainer.py:66) with the JAX
single-controller SPMD model: build a Mesh once, place the batch with a
NamedSharding over the 'data' axis, keep params replicated (or sharded for
large models), and let XLA insert the gradient psums over ICI.

Axes:
  data    — batch (pure DP; like-for-like with the reference's only strategy)
  spatial — H-axis sharding for >128^2 native-resolution training (the
            extension the reference lacks; pairs with a distributed FFT,
            dpot_tpu/parallel/dist_fft.py)
  model   — tensor parallelism over the block weights (AFNO mode-MLP block
            axis + Megatron-style channel MLP, dpot_tpu/parallel/tensor.py)
  pipe    — pipeline parallelism over the block DEPTH (GPipe microbatch
            schedule as one SPMD program, dpot_tpu/parallel/pipeline.py)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    spatial: int = 1,
    model: int = 1,
    pipe: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // (spatial * model * pipe)
    assert data * spatial * model * pipe == n, (
        f"mesh {data}x{pipe}x{spatial}x{model} != {n} devices"
    )
    # 'model' innermost: TP's per-layer collectives (fc2 psum) are the
    # latency-critical ones, so they should ride the fastest ICI hops.
    # 'pipe' outermost after data: its ring moves one activation per
    # microbatch tick — the least latency-sensitive traffic, fine on the
    # slowest hops (that slack is exactly why PP suits DCN topologies)
    arr = np.array(devices).reshape(data, pipe, spatial, model)
    return Mesh(arr, ("data", "pipe", "spatial", "model"))


def batch_spec(
    ndim: int, spatial_sharded: bool = False, scan_axis: bool = False
) -> P:
    """PartitionSpec for a (B, H, W, ..., T, C) batch tensor: batch over
    'data', optionally H over 'spatial'. scan_axis=True prepends an
    UNSHARDED leading axis — the (K, B, ...) layout of a fused K-step
    dispatch (train/step.py scan_steps), where lax.scan slices axis 0 and
    each per-step slice keeps its 'data' sharding on what becomes the
    batch axis."""
    parts: list = [None, "data"] if scan_axis else ["data"]
    if ndim > len(parts):
        parts.append("spatial" if spatial_sharded else None)
    parts += [None] * (ndim - len(parts))
    return P(*parts)


_replicated_fallbacks = 0


def replicated_fallback_count() -> int:
    """How many times shard_batch had to replicate a non-divisible batch."""
    return _replicated_fallbacks


def shard_batch(
    batch: dict,
    mesh: Mesh,
    spatial_sharded: bool = False,
    scan_axis: bool = False,
) -> dict:
    """Place a host batch dict onto the mesh, batch-sharded over 'data'.
    scan_axis=True expects (K, B, ...) leaves (fused multi-step dispatch,
    batch_spec) and shards axis 1 instead.

    Falls back to replicated placement for arrays whose leading dim does not
    divide the 'data' axis (e.g. a trailing partial batch) — correctness is
    preserved, but every device then computes the full batch, so the step
    quietly costs ~data_parallel x more. The fallback therefore warns once
    and counts occurrences (replicated_fallback_count) so loops/tests can
    assert it never triggers on their steady-state path.
    """
    global _replicated_fallbacks
    n_data = mesh.shape["data"]
    out = {}
    for k, v in batch.items():
        batch_axis = 1 if scan_axis and np.ndim(v) > 1 else 0
        if np.ndim(v) > 0 and np.shape(v)[batch_axis] % n_data == 0:
            spec = batch_spec(
                np.ndim(v), spatial_sharded,
                scan_axis=scan_axis and np.ndim(v) > 1,
            )
        else:
            spec = P()
            if np.ndim(v) > 0 and n_data > 1:
                _replicated_fallbacks += 1
                if _replicated_fallbacks == 1:
                    import warnings

                    warnings.warn(
                        f"shard_batch: batch dim {np.shape(v)[batch_axis]} "
                        f"of {k!r} "
                        f"does not divide data axis {n_data}; replicating "
                        "(correct but ~data_parallel x slower). Pad or drop "
                        "trailing partial batches to avoid this.",
                        stacklevel=2,
                    )
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/state) over the mesh.

    Multi-process meshes span non-addressable devices, where device_put is
    illegal; there the global replicated array is assembled from the
    (identical, seed-deterministic) host copies via
    make_array_from_process_local_data. PRNG key arrays travel as raw key
    data (np.asarray cannot see through the extended dtype)."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def rep(x):
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(
            x.dtype, jax.dtypes.prng_key
        ):
            impl = jax.random.key_impl(x)
            data = np.asarray(jax.random.key_data(x))
            g = jax.make_array_from_process_local_data(sharding, data)
            return jax.random.wrap_key_data(g, impl=impl)
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(rep, tree)
