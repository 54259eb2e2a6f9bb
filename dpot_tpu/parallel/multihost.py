"""Multi-host (multi-slice) support.

The reference launches N processes with `accelerate launch`
(parallel_trainer.py:66); the JAX equivalent is one controller per host +
`jax.distributed.initialize()` and a global mesh over all hosts' devices
(collectives ride ICI within a slice, DCN across slices). The data mixture
is sharded per host: each process loads 1/num_hosts of every global batch
and forms the global array with `jax.make_array_from_process_local_data`.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Call jax.distributed.initialize() when a multi-process env is
    configured (env vars JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID, or explicit args). Safe no-op otherwise.

    On the CPU backend the gloo collectives implementation is selected so
    multi-process CPU runs work out of the box (the 2-process test path,
    tests/test_multihost.py)."""
    # NOTE: no jax.process_count() probe here — any backend query would
    # initialize XLA and make jax.distributed.initialize() illegal. Check
    # the cheap env/args first; double-initialization is caught below.
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or int(
        os.environ.get("JAX_NUM_PROCESSES", 0)
    ) or None
    process_id = (
        process_id
        if process_id is not None
        else (int(os.environ["JAX_PROCESS_ID"])
              if "JAX_PROCESS_ID" in os.environ else None)
    )
    if not (coordinator or num_processes):
        return False
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # non-CPU backends pick their native collectives
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # idempotent re-entry. jax 0.9 says "distributed.initialize should
        # only be called once"; older versions said "already initialized"
        if "already" in str(e) or "only be called once" in str(e):
            return True
        raise
    return True


def global_batch_from_local(batch: dict, mesh: Mesh,
                            spatial_sharded: bool = False) -> dict:
    """Assemble per-host numpy shards into global sharded jax.Arrays.

    Mirrors mesh.shard_batch's graceful degradation: a global batch whose
    size doesn't divide the 'data' axis (trailing tail the loader's
    host-divisibility filter let through) is fully replicated — every
    process holds the SAME global batch in that case, which
    make_array_from_process_local_data cannot express per-host, so it is
    device_put replicated via process-local assembly."""
    from dpot_tpu.parallel.mesh import batch_spec

    n_data = mesh.shape["data"]
    n_proc = jax.process_count()
    out = {}
    for k, v in batch.items():
        divisible = (
            np.ndim(v) == 0
            or (np.shape(v)[0] * n_proc) % n_data == 0
        )
        spec = (
            batch_spec(np.ndim(v), spatial_sharded)
            if np.ndim(v) > 0 and divisible
            else P()
        )
        sharding = NamedSharding(mesh, spec)
        if n_proc == 1:
            out[k] = jax.device_put(v, sharding)
        elif divisible:
            out[k] = jax.make_array_from_process_local_data(sharding, v)
        else:
            # replicated fallback: every host concatenates the full global
            # batch from the per-host slices via allgather-by-construction
            # (the loader gives each host a contiguous slice; a replicated
            # global array must carry the CONCATENATION). Correct but
            # n_data x redundant compute — same warning contract as
            # shard_batch.
            import warnings

            warnings.warn(
                f"global batch dim {np.shape(v)[0] * n_proc} of {k!r} does "
                f"not divide data axis {n_data}; replicating this batch "
                "(correct but slower). Pad or drop trailing partials.",
                stacklevel=2,
            )
            glob = _allgather_host_slices(np.asarray(v))
            out[k] = jax.make_array_from_process_local_data(sharding, glob)
    return out


def _allgather_host_slices(local: np.ndarray) -> np.ndarray:
    """Concatenate each process's contiguous batch slice into the full
    global batch on EVERY process (host-side, via the jax.experimental
    multihost utils broadcast; cheap — tails are rare and small)."""
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(local, tiled=True)
    )
