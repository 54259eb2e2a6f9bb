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
        if "already" in str(e):
            return True  # idempotent re-entry
        raise
    return True


def host_batch_slice(global_batch_size: int) -> tuple[int, int]:
    """(start, size) of this host's slice of a global batch."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch_size // n
    assert per * n == global_batch_size, (
        f"global batch {global_batch_size} must divide {n} hosts"
    )
    return i * per, per


def global_batch_from_local(batch: dict, mesh: Mesh,
                            spatial_sharded: bool = False) -> dict:
    """Assemble per-host numpy shards into global sharded jax.Arrays."""
    from dpot_tpu.parallel.mesh import batch_spec

    out = {}
    for k, v in batch.items():
        spec = (
            batch_spec(np.ndim(v), spatial_sharded) if np.ndim(v) > 0 else P()
        )
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out
