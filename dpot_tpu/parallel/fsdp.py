"""FSDP/ZeRO-style parameter + optimizer-state sharding.

The reference has no answer to models that don't fit one accelerator
(SURVEY.md §2.5: no FSDP/ZeRO); DPOT-H (1.03B params) needs ~12GB of fp32
params+Adam state before activations. Here: annotate every large parameter
with a NamedSharding that splits its largest divisible axis over a mesh
axis, place params AND optimizer moments with those shardings, and let
XLA's SPMD partitioner insert the all-gathers (params, forward/backward)
and reduce-scatters (grads) over ICI — the standard JAX recipe
(jax-ml.github.io/scaling-book).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dpot_tpu.train.state import TrainState


def param_spec(
    p: Any, n_shards: int, axis: str = "data", min_size: int = 2**16
) -> P:
    """Pick the largest evenly-divisible axis to shard; replicate small
    params (their all-gather overhead would dominate)."""
    return shape_spec(np.shape(p), n_shards, axis, min_size)


def shape_spec(
    shape: tuple, n_shards: int, axis: str = "data", min_size: int = 2**16
) -> P:
    """param_spec on a bare shape (no array needed)."""
    if int(np.prod(shape)) < min_size:
        return P()
    for i in sorted(range(len(shape)), key=lambda i: -shape[i]):
        if shape[i] % n_shards == 0 and shape[i] >= n_shards:
            parts: list = [None] * len(shape)
            parts[i] = axis
            return P(*parts)
    return P()


def fsdp_specs(params: Any, mesh: Mesh, axis: str = "data",
               min_size: int = 2**16) -> Any:
    n = mesh.shape[axis]
    return jax.tree.map(lambda p: param_spec(p, n, axis, min_size), params)


def _put_global(x, mesh: Mesh, spec: P):
    """Place one leaf with a NamedSharding. Single-controller: device_put.
    Multi-process meshes span non-addressable devices where device_put of
    a committed local array is illegal — there the global sharded array
    is assembled from this process's (identical, seed-deterministic or
    checkpoint-restored) host copy via make_array_from_callback; PRNG
    keys travel as raw key data (same pattern as mesh.replicate)."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if hasattr(x, "dtype") and jax.dtypes.issubdtype(
        x.dtype, jax.dtypes.prng_key
    ):
        impl = jax.random.key_impl(x)
        data = np.asarray(jax.random.key_data(x))
        g = jax.make_array_from_callback(
            data.shape, NamedSharding(mesh, P()), lambda idx: data[idx]
        )
        return jax.random.wrap_key_data(g, impl=impl)
    host = np.asarray(x)
    return jax.make_array_from_callback(
        host.shape, sharding, lambda idx: host[idx]
    )


def place_state(state: TrainState, mesh: Mesh, spec_fn) -> TrainState:
    """Place params and matching optimizer moments with spec_fn(tree)
    shardings; scalars (step counts, rng) replicated. spec_fn maps a
    param-shaped pytree to a PartitionSpec tree — the shared placement
    engine behind FSDP (fsdp_specs) and tensor parallelism
    (parallel/tensor.py tp_specs). Works on multi-process meshes too
    (_put_global)."""

    def put(tree):
        return jax.tree.map(
            lambda x, s: _put_global(x, mesh, s), tree, spec_fn(tree)
        )

    params = put(state.params)

    def put_opt(x):
        # moments share the param tree structure inside AdamState.mu/nu;
        # anything else (counts) is replicated
        return _put_global(x, mesh, P())

    def place_opt(entry):
        # walk the optax state recursively: chains are plain tuples,
        # wrappers (optax.masked's MaskedState — what TrainState.create
        # produces for models with non-param collections like UNet's
        # batch_stats) carry the real state in .inner_state. Without the
        # unwrap, a masked optimizer's moments would be silently
        # REPLICATED — at H scale that's the 12GB/chip OOM FSDP exists to
        # prevent, and check_shardings would vacuously pass.
        if isinstance(entry, tuple) and not hasattr(entry, "_fields"):
            return tuple(place_opt(e) for e in entry)
        if hasattr(entry, "inner_state"):
            return entry._replace(inner_state=place_opt(entry.inner_state))
        if hasattr(entry, "mu") and hasattr(entry, "nu"):
            return entry._replace(
                count=put_opt(entry.count),
                mu=put(entry.mu),
                nu=put(entry.nu),
            )
        return jax.tree.map(put_opt, entry)

    opt_state = place_opt(state.opt_state)

    return state.replace(
        params=params,
        opt_state=opt_state,
        step=put_opt(state.step),
        rng=_put_global(state.rng, mesh, P()),
    )


def shard_state_fsdp(
    state: TrainState, mesh: Mesh, axis: str = "data", min_size: int = 2**16
) -> TrainState:
    """Place params and matching optimizer moments with FSDP shardings."""
    return place_state(
        state, mesh, lambda tree: fsdp_specs(tree, mesh, axis, min_size)
    )


def _moment_entries(opt_state):
    """Yield the optimizer-state entries that carry param-shaped moments
    (AdamState-likes with .mu/.nu), walking chained-transform tuples AND
    wrapper states (optax.masked's .inner_state) — a masked optimizer's
    moments must not escape the sharding checks."""
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "_fields"):
        for entry in opt_state:
            yield from _moment_entries(entry)
        return
    if hasattr(opt_state, "inner_state"):
        yield from _moment_entries(opt_state.inner_state)
        return
    if hasattr(opt_state, "mu") and hasattr(opt_state, "nu"):
        yield opt_state


def check_shardings(
    state: TrainState, mesh: Mesh, spec_fn, min_size: int = 2**16
) -> list:
    """Verify shardings SURVIVED a jitted train step: every large leaf of
    params and of each moment tree must occupy NO MORE per-device memory
    than its spec_fn sharding intends. XLA is free to change output
    shardings unless pinned by the inputs; a silent re-replication at H
    scale is a 12GB/chip OOM on real hardware (VERDICT r2 weak #2). A leaf
    that comes back MORE sharded than the spec (XLA sometimes adds a
    'spatial' split to params consumed by spatially-sharded activations,
    e.g. pos_embed on a dp x sp mesh) uses less memory and is fine.
    Returns [(path, got_sharding, wanted_spec), ...] — empty means good."""
    from jax.tree_util import keystr, tree_flatten_with_path

    bad = []

    def walk(tree, tag):
        specs = jax.tree.leaves(spec_fn(tree), is_leaf=lambda s: isinstance(s, P))
        leaves, _ = tree_flatten_with_path(tree)
        assert len(leaves) == len(specs)
        for (path, x), s in zip(leaves, specs):
            if int(np.prod(np.shape(x))) < min_size:
                continue
            want = NamedSharding(mesh, s)
            got_per_dev = int(np.prod(x.sharding.shard_shape(np.shape(x))))
            want_per_dev = int(np.prod(want.shard_shape(np.shape(x))))
            if got_per_dev > want_per_dev:
                bad.append((tag + keystr(path), x.sharding, s))

    walk(state.params, "params")
    for i, entry in enumerate(_moment_entries(state.opt_state)):
        walk(entry.mu, f"opt[{i}].mu")
        walk(entry.nu, f"opt[{i}].nu")
    return bad


def check_fsdp_shardings(
    state: TrainState, mesh: Mesh, axis: str = "data", min_size: int = 2**16
) -> list:
    """check_shardings against the FSDP spec tree."""
    return check_shardings(
        state, mesh, lambda tree: fsdp_specs(tree, mesh, axis, min_size),
        min_size,
    )
