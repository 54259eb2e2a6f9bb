"""Model/shape inspection utilities.

Counterparts of the reference's torch_utils/misc.py helpers:
assert_shape (:99), print_module_summary (:213), check_ddp_consistency
(:197 — here: check replica consistency across a mesh), plus
save_results (utils/utilities.py save_results_excel, as CSV — no openpyxl
dependency)."""

from __future__ import annotations

import csv
from typing import Any, Optional, Sequence

import jax
import numpy as np


def assert_shape(x, ref_shape: Sequence[Optional[int]]):
    """torch_utils/misc.py:99 equivalent: None entries are wildcards."""
    shape = np.shape(x)
    if len(shape) != len(ref_shape):
        raise AssertionError(
            f"wrong rank: got {len(shape)}, expected {len(ref_shape)}"
        )
    for i, (got, want) in enumerate(zip(shape, ref_shape)):
        if want is not None and got != want:
            raise AssertionError(
                f"wrong size for dim {i}: got {got}, expected {want}"
            )


def module_summary(params: Any, max_rows: int = 200) -> str:
    """Parameter table (print_module_summary analogue): path, shape, count."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    lines = [f"{'parameter':60s} {'shape':>20s} {'count':>12s}"]
    total = 0
    for path, leaf in flat[:max_rows]:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        n = int(np.prod(np.shape(leaf)))
        total += n
        lines.append(f"{name:60s} {str(np.shape(leaf)):>20s} {n:>12,d}")
    if len(flat) > max_rows:
        for _, leaf in flat[max_rows:]:
            total += int(np.prod(np.shape(leaf)))
        lines.append(f"... ({len(flat) - max_rows} more)")
    lines.append(f"{'TOTAL':60s} {'':>20s} {total:>12,d}")
    return "\n".join(lines)


def check_replica_consistency(tree: Any, atol: float = 0.0) -> None:
    """check_ddp_consistency analogue: every addressable shard of a
    replicated array must hold identical values."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not hasattr(leaf, "addressable_shards"):
            continue
        shards = leaf.addressable_shards
        if len(shards) < 2:
            continue
        base = np.asarray(shards[0].data)
        for s in shards[1:]:
            if s.index != shards[0].index:
                # actually sharded (different global slices hold different
                # values by design) — shard SHAPES can match even when
                # sharded evenly, so compare indices, not shapes
                continue
            # atol=0.0 means EXACT (the reference check_ddp_consistency
            # compares bit patterns); rtol must be 0 or np.allclose's
            # default 1e-5 would mask real replica desyncs
            if not np.allclose(np.asarray(s.data), base, rtol=0.0, atol=atol):
                name = "/".join(str(getattr(k, "key", k)) for k in path)
                raise AssertionError(f"replica mismatch at {name}")


def save_results(path: str, rows: list[dict]) -> None:
    """save_results_excel analogue (CSV): one row per eval record."""
    if not rows:
        return
    keys = sorted({k for r in rows for k in r})
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(rows)
