"""Tensor parallelism over the DPOT block stack ('model' mesh axis).

The reference's only parallel strategy is DDP (SURVEY.md §2.5); FSDP
(parallel/fsdp.py) already covers fitting big models, but its per-step
all-gathers scale with TOTAL param bytes. TP instead keeps each weight
shard resident on its device and moves ACTIVATIONS, which is the winning
trade for latency-bound inference and for wide trunks (H: embed 2048,
mlp hidden 8192) — see SCALING.md §tp for the roofline.

DPOT's trunk is unusually TP-friendly:

- The AFNO mode MLP is block-diagonal over `n_blocks` independent complex
  blocks (w1/w2: (2, nb, bs, bs*f), models/dpot.py AFNO2D). Sharding the
  nb axis makes the ENTIRE spectral mixer comms-free under TP — each
  device filters its own channel blocks (the DFT matmuls contract over
  pixels, not channels, so they shard trivially too).
- The channel MLP gets the Megatron split: fc1 column-parallel (hidden
  sharded), fc2 row-parallel (one psum per block over 'model').

No model-code changes: specs on the WEIGHTS alone are enough — XLA's
SPMD partitioner propagates them through the einsums/reshapes and inserts
the collectives (the scaling-book recipe: annotate, compile, done).
GroupNorm stays correct under propagation regardless of what sharding the
partitioner picks for activations (it is free to all-gather); with
tp | norm_groups the channel shards align with whole stat groups, so the
partitioner can keep stats device-local.

Composes with FSDP: `tp_specs(..., fsdp_axis='data', ...)` additionally
shards each leaf's largest remaining axis over 'data' (2D sharding), and
replicated-under-TP leaves (embeddings, heads) fall back to plain FSDP.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.tree_util import tree_map_with_path

from dpot_tpu.parallel.fsdp import check_shardings, place_state, shape_spec
from dpot_tpu.train.state import TrainState

# leaves sharded over 'model', keyed by (parent module, param name):
# value = index of the axis to shard
_TP_RULES = {
    # AFNO2D/AFNO3D spectral weights (2, nb, ...) — block axis
    ("filter", "w1"): 1,
    ("filter", "b1"): 1,
    ("filter", "w2"): 1,
    ("filter", "b2"): 1,
    # Block channel MLP: fc1 column-parallel, fc2 row-parallel
    ("mlp_fc1", "kernel"): 1,
    ("mlp_fc1", "bias"): 0,
    ("mlp_fc2", "kernel"): 0,
}


def _path_names(path) -> list:
    return [getattr(k, "key", getattr(k, "name", str(k))) for k in path]


def tp_spec_for(
    path, shape, tp: int, axis: str = "model",
    fsdp_axis: Optional[str] = None, fsdp_shards: int = 1,
    min_size: int = 2**16,
) -> P:
    """PartitionSpec for one param leaf under tensor parallelism."""
    names = _path_names(path)
    leaf = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""
    dim = _TP_RULES.get((parent, leaf))
    if dim is None or dim >= len(shape) or shape[dim] % tp:
        # not a TP target (or indivisible): plain FSDP fallback if requested
        if fsdp_axis is not None:
            return shape_spec(shape, fsdp_shards, fsdp_axis, min_size)
        return P()
    parts: list = [None] * len(shape)
    parts[dim] = axis
    if fsdp_axis is not None and int(np.prod(shape)) >= min_size:
        # 2D sharding: also split the largest remaining divisible axis
        for i in sorted(range(len(shape)), key=lambda i: -shape[i]):
            if i != dim and shape[i] % fsdp_shards == 0 and shape[i] >= fsdp_shards:
                parts[i] = fsdp_axis
                break
    return P(*parts)


def tp_specs(
    params: Any, mesh: Mesh, axis: str = "model",
    fsdp_axis: Optional[str] = None, min_size: int = 2**16,
) -> Any:
    """PartitionSpec tree for TP (optionally 2D TP x FSDP) placement."""
    tp = mesh.shape[axis]
    fsdp_shards = mesh.shape[fsdp_axis] if fsdp_axis is not None else 1
    return tree_map_with_path(
        lambda p, x: tp_spec_for(
            p, np.shape(x), tp, axis, fsdp_axis, fsdp_shards, min_size
        ),
        params,
    )


def shard_params_tp(
    params: Any, mesh: Mesh, axis: str = "model",
    fsdp_axis: Optional[str] = None, min_size: int = 2**16,
) -> Any:
    """TP-place a bare param tree (no TrainState) — the inference/serving
    path: sharded weights + replicated activations give each chip 1/n of
    the per-AR-step weight reads (the B=1 rollout bottleneck)."""
    from jax.sharding import NamedSharding

    specs = tp_specs(params, mesh, axis, fsdp_axis, min_size)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
    )


def shard_state_tp(
    state: TrainState, mesh: Mesh, axis: str = "model",
    fsdp_axis: Optional[str] = None, min_size: int = 2**16,
) -> TrainState:
    """Place params and optimizer moments with TP (x optional FSDP)
    shardings; scalars replicated. jit then propagates the shardings
    through the train step (inputs pin outputs via donation)."""
    return place_state(
        state, mesh,
        lambda tree: tp_specs(tree, mesh, axis, fsdp_axis, min_size),
    )


def check_tp_shardings(
    state: TrainState, mesh: Mesh, axis: str = "model",
    fsdp_axis: Optional[str] = None, min_size: int = 2**16,
) -> list:
    """check_shardings against the TP spec tree (post-step survival)."""
    return check_shardings(
        state, mesh,
        lambda tree: tp_specs(tree, mesh, axis, fsdp_axis, min_size),
        min_size,
    )


def count_tp_leaves(params: Any, mesh: Mesh, axis: str = "model") -> int:
    """How many leaves actually carry a 'model'-axis sharding (sanity for
    dryruns/tests: 7 per Block for DPOTNet)."""
    specs = jax.tree.leaves(
        tp_specs(params, mesh, axis),
        is_leaf=lambda s: isinstance(s, P),
    )
    return sum(1 for s in specs if any(a == axis for a in s))
