"""Pipeline parallelism over the DPOT block stack ('pipe' mesh axis).

The reference has no pipeline strategy (its only parallelism is DDP,
SURVEY.md §2.5); this is the TPU-native completion of the parallelism
matrix (dp x sp x tp x fsdp x pp). PP splits the DEPTH of the trunk:
each of P stages holds depth/P whole blocks resident and microbatches
flow through the ring via `lax.ppermute` — the classic GPipe schedule
expressed as one SPMD program under `jax.shard_map` (no per-stage
processes, no send/recv framework; XLA lowers the permutes onto ICI).

When it wins (SCALING.md §pp): cross-slice / DCN-connected topologies
where TP's per-layer psums are too chatty — PP moves ONE activation
tensor per stage per microbatch tick, the cheapest possible inter-chip
traffic pattern, at the cost of a (P-1)/(M+P-1) bubble (M microbatches).
Within one ICI domain, prefer dp/FSDP for pretraining and TP for
weight-bound inference (measured rationale in SCALING.md).

Design notes:
- Param layout stays CANONICAL (`blocks_{i}` subtrees — the torch
  converters and checkpoints never see a difference). The stacked
  (L, ...) arrays exist only inside the jitted step; XLA folds the
  stack+shard into keeping each stage's slice device-local.
- The schedule is a `lax.scan` over M+P-1 ticks; each tick every stage
  applies its local blocks (a nested scan over depth/P layers) and
  ppermutes the activation to the next stage. Reverse-mode AD works
  through both scans and the ppermute (its transpose is the reverse
  permute), so the same program trains.
- Composes with data parallelism: the microbatch dimension's batch axis
  stays sharded over 'data' inside the shard_map (no collectives touch
  it), so a (data=2, pipe=4) mesh runs 2-way DP x 4-stage PP.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def stack_layers(layer_params: Sequence[Any]):
    """Stack L structurally-identical per-layer param trees into one tree
    of (L, ...) arrays (the scan/pipeline layout)."""
    return jax.tree.map(lambda *ls: jnp.stack(ls), *layer_params)


def pipeline_blocks(
    layer_params: Sequence[Any],
    x: jax.Array,
    mesh: Mesh,
    block_apply: Callable[[Any, jax.Array], jax.Array],
    n_micro: int,
    pipe_axis: str = "pipe",
    data_axis: str = "data",
) -> jax.Array:
    """Run x through L sequential blocks, pipelined over mesh[pipe_axis].

    layer_params: L per-layer trees (layer i == `blocks_{i}`), L % P == 0;
    block_apply(params_i, x) applies ONE block. x: (B, spatial..., D) with
    batch possibly sharded over data_axis. n_micro microbatches (B % n_micro
    == 0, and the microbatch size must stay divisible by the data axis).
    Returns block_L(...block_0(x)) exactly — the pipeline is an execution
    schedule, not an approximation; equivalence is pinned by
    tests/test_pipeline.py.
    """
    n_pipe = mesh.shape[pipe_axis]
    n_data = mesh.shape.get(data_axis, 1)
    L = len(layer_params)
    B = x.shape[0]
    assert L % n_pipe == 0, (
        f"depth {L} must divide over pipe={n_pipe} stages"
    )
    if n_pipe == 1:  # degenerate: plain sequential trunk
        for p in layer_params:
            x = block_apply(p, x)
        return x
    # degrade gracefully on awkward batches (eval's trailing partial batch):
    # fewer microbatches = a bigger bubble, never a wrong answer
    n_micro = max(1, min(n_micro, B))
    while n_micro > 1 and B % n_micro:
        n_micro -= 1
    mb = B // n_micro
    # shard the microbatch over 'data' only when it divides; a replicated
    # microbatch (each data row redundantly computing) is still correct —
    # but it is n_data× redundant WORK, so surface it (trace-time, so once
    # per compiled shape, not per step)
    if n_data > 1 and mb % n_data:
        import warnings

        warnings.warn(
            f"pipeline microbatch size {mb} (B={B}, n_micro={n_micro}) is "
            f"not divisible by the data axis ({n_data}): every data shard "
            f"will redundantly compute ALL microbatches ({n_data}x the "
            "trunk FLOPs). Fine for an eval tail batch; for training pick "
            "pipe_microbatches so B/n_micro % mesh_data == 0."
        )
    data_axis = data_axis if (n_data > 1 and mb % n_data == 0) else None

    stacked = stack_layers(layer_params)  # (L, ...) leaves
    xs = x.reshape(n_micro, mb, *x.shape[1:])
    feat_nones = (None,) * (x.ndim - 1)

    def stage(params_stk, xs_loc):
        # params_stk: (L/P, ...) this stage's layers; xs_loc: the data-axis
        # shard of every microbatch, (M, mb/n_data, spatial..., D)
        idx = lax.axis_index(pipe_axis)
        perm = [(i, (i + 1) % n_pipe) for i in range(n_pipe)]
        M = xs_loc.shape[0]

        def apply_local(cur):
            def body(c, lp):
                return block_apply(lp, c), None

            out, _ = lax.scan(body, cur, params_stk)
            return out

        def tick(carry, t):
            cur, buf = carry
            # stage 0 injects microbatch t (clamped: past-M ticks re-feed
            # the last microbatch; their results never reach the buffer)
            inject = xs_loc[jnp.clip(t, 0, M - 1)]
            cur = jnp.where(idx == 0, inject, cur)
            out = apply_local(cur)
            # the last stage finishes microbatch t-(P-1) at tick t
            oi = t - (n_pipe - 1)
            oi_c = jnp.clip(oi, 0, M - 1)
            keep = (idx == n_pipe - 1) & (oi >= 0)
            buf = buf.at[oi_c].set(jnp.where(keep, out, buf[oi_c]))
            nxt = lax.ppermute(out, pipe_axis, perm)
            return (nxt, buf), None

        buf0 = jnp.zeros(xs_loc.shape, x.dtype)
        cur0 = jnp.zeros(xs_loc.shape[1:], x.dtype)
        (_, buf), _ = lax.scan(
            tick, (cur0, buf0), jnp.arange(M + n_pipe - 1)
        )
        # only the last stage holds real outputs — broadcast over the ring
        return lax.psum(
            jnp.where(idx == n_pipe - 1, buf, jnp.zeros_like(buf)), pipe_axis
        )

    y = jax.shard_map(
        stage,
        mesh=mesh,
        in_specs=(P(pipe_axis), P(None, data_axis, *feat_nones)),
        out_specs=P(None, data_axis, *feat_nones),
        check_vma=False,
    )(stacked, xs)
    return y.reshape(B, *x.shape[1:])
