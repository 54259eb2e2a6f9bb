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


def maybe_initialize(coordinator: Optional[str] = None) -> bool:
    """Call jax.distributed.initialize() when a multi-process env is
    configured (env vars or explicit coordinator). Safe no-op otherwise."""
    if jax.process_count() > 1:
        return True  # already initialized
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator or os.environ.get("JAX_NUM_PROCESSES"):
        jax.distributed.initialize()
        return True
    return False


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
