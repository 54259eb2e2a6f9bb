"""Checkpointing: orbax full-train-state save/restore + component surgery.

Capability parity with the reference's checkpoint utilities
(utils/utilities.py:99-207) with one deliberate upgrade: the reference's
torch.save({'args','model','optimizer'}) drops the scheduler state and epoch
(train_temporal.py:287) so "resume" restarts schedules; here the full
TrainState (params, opt state, step count, PRNG key) round-trips.

Component surgery ports:
- load_components_from_pretrained (utilities.py:112-166): selectively copy
  patch_embed / pos / blocks / scale_feats / cls_head / time_agg / out
  subtrees from a source param tree.
- load_3d_components_from_2d (utilities.py:170-207): inflate 2D pointwise
  weights into the 3D model (see dpot_tpu/train/interop.py for the axis
  mapping).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Sequence

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False

from dpot_tpu.train.state import TrainState


def _host_payload(state: TrainState) -> dict:
    """Fetch the full train state to host numpy, rank-0-safely (the plain
    device_get the old save used crashes on the tunneled TPU backend for
    the step/opt counters — utils/profiling.host_fetch)."""
    from dpot_tpu.utils.profiling import host_fetch

    return host_fetch(
        {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
            "rng": jax.random.key_data(state.rng),
        }
    )


def _live_state_dir(path: str) -> str:
    """The restorable orbax state dir: 'state', or the completed
    'state.new' left by a crash between _write_payload's rmtree and rename
    ('state.new' is always fully written + fenced before the swap starts,
    so it is a valid checkpoint whenever 'state' is absent)."""
    target = os.path.join(path, "state")
    if not os.path.exists(target) and os.path.exists(target + ".new"):
        return target + ".new"
    return target


def _write_payload(path: str, payload: dict, config: Optional[dict]) -> None:
    """Write a host payload to disk. The live checkpoint is replaced
    crash-safely: the new state is fully written to 'state.new' first,
    then swapped in. A crash mid-write leaves the previous checkpoint
    intact; a crash mid-swap leaves the completed 'state.new', which
    restore falls back to (_live_state_dir).

    Multihost writes take the npz path even when orbax is available:
    ocp's AsyncCheckpointer runs cross-process barriers when
    jax.distributed is initialized, and only process 0 reaches this
    function — a one-process orbax save would hang on those barriers.
    The payload is plain host numpy either way; restore reads both
    formats."""
    os.makedirs(path, exist_ok=True)
    if _HAS_ORBAX and jax.process_count() == 1:
        import shutil

        target = os.path.join(path, "state")
        tmp = target + ".new"
        if os.path.exists(tmp):
            if os.path.exists(target):
                shutil.rmtree(tmp)
            else:
                # a crash mid-swap left 'state.new' as the ONLY valid
                # checkpoint — complete the interrupted swap before
                # starting this write, so a failure DURING this write
                # still leaves a restorable state on disk
                os.rename(tmp, target)
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(tmp, payload)
        ckpt.wait_until_finished()
        if os.path.exists(target):
            shutil.rmtree(target)
        os.rename(tmp, target)
    else:  # flat-npz fallback
        flat, treedef = jax.tree.flatten(payload)
        # record how many flat leaves belong to each top-level section
        # (dict flattening is KEY-SORTED: opt_state < params < rng < step)
        # so restore_params can slice out exactly the params leaves
        sections = {
            k: len(jax.tree.leaves(payload[k])) for k in sorted(payload)
        }
        final = os.path.join(path, "state.npz")
        tmp = final + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(
                f,
                *[np.asarray(x) for x in flat],
                treedef=str(treedef),
                sections=json.dumps(sections),
            )
        os.replace(tmp, final)
    if config is not None:
        with open(os.path.join(path, "params.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)


class AsyncCheckpointWriter:
    """Overlap checkpoint IO with training. save_checkpoint(..., writer=)
    fetches the state to host synchronously (numpy copies — the next
    step's buffer donation can't invalidate them) and hands the disk
    write to this worker thread, so an H-scale save (~12 GB, ~10 s of
    disk) no longer stalls the step loop. submit() blocks while a
    previous write is still queued, bounding host memory to ~2 in-flight
    payloads; wait() fences everything written so far (train() fences
    before returning, so a checkpoint is always complete on disk once
    train() has returned)."""

    def __init__(self):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=1)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                self._q.task_done()
                return
            try:
                _write_payload(*item)
            except BaseException as e:  # surfaced on the next submit/wait
                self._err = e
            finally:
                self._q.task_done()

    def _check(self):
        if self._err is not None:
            err, self._err = self._err, None
            raise RuntimeError("async checkpoint write failed") from err

    def submit(self, path: str, payload: dict, config: Optional[dict]):
        self._check()
        self._q.put((path, payload, config))

    def wait(self):
        """Block until every submitted write has hit the disk."""
        self._q.join()
        self._check()

    def close(self):
        try:
            self.wait()
        finally:
            # always stop the worker — a failed write must not strand the
            # thread (and its queued payload reference) behind the raise
            self._q.put(None)
            self._thread.join()


def save_checkpoint(
    path: str,
    state: TrainState,
    config: Optional[dict] = None,
    writer: Optional[AsyncCheckpointWriter] = None,
):
    """Save full train state (params/opt/step/rng) + config json. With a
    writer, the disk write happens in the background (see
    AsyncCheckpointWriter); the host fetch is synchronous either way.

    Multihost: call on ALL processes when the state is cross-process
    sharded (FSDP/TP over a multi-process mesh) — the host fetch
    all-gathers sharded leaves, a collective. Only process 0 writes."""
    path = os.path.abspath(path)
    payload = _host_payload(state)
    if jax.process_index() != 0:
        return
    if writer is not None:
        writer.submit(path, payload, config)
    else:
        _write_payload(path, payload, config)


def _wrap_saved_rng(data):
    """Rebuild the PRNG key with the impl it was SAVED under, inferred from
    the key-data layout (threefry2x32 = uint32[2], rbg = uint32[4]).
    training_key() picks rbg on TPU / threefry on CPU, so a checkpoint may
    be restored on a platform whose default impl differs — both impls run
    on every backend, and keeping the saved impl keeps the exact noise
    stream."""
    import jax.numpy as jnp

    arr = jnp.asarray(data)
    impl = {2: "threefry2x32", 4: "rbg"}.get(int(arr.shape[-1]))
    if impl is None:  # unknown layout: new stream, loudly
        import warnings

        warnings.warn(
            f"unrecognized saved PRNG key layout {arr.shape}; starting a "
            "fresh key"
        )
        return jax.random.key(0)
    return jax.random.wrap_key_data(arr, impl=impl)


def _shell(a):
    """Host zeros with a leaf's shape/dtype — a restore template needs
    only metadata. Building it this way (instead of device_get'ing the
    live state) avoids a full D2H copy of the model (~12 GB at H over the
    tunnel) and the rank-0 D2H crash on the tunneled TPU backend (the
    step/opt counters are rank-0; see utils/profiling.host_fetch)."""
    if isinstance(a, (np.ndarray, np.generic)):
        return np.zeros(a.shape, a.dtype)
    if hasattr(a, "shape") and hasattr(a, "dtype"):
        return np.zeros(tuple(a.shape), np.dtype(a.dtype))
    return np.asarray(a)  # python scalar leaf


def restore_checkpoint(path: str, state: TrainState) -> TrainState:
    """Restore into an existing (abstract-compatible) TrainState. The rng
    leaf is restored impl-agnostically (see _wrap_saved_rng)."""
    path = os.path.abspath(path)
    template = jax.tree.map(
        _shell,
        {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
            "rng": jax.random.key_data(state.rng),
        },
    )
    state_dir = _live_state_dir(path)
    if _HAS_ORBAX and os.path.exists(state_dir):
        ckpt = ocp.StandardCheckpointer()
        try:
            payload = ckpt.restore(state_dir, template)
        except Exception as orig:
            # rng layout mismatch (checkpoint from a platform with the
            # other PRNG impl): retry with the alternative key-data shape.
            # If the retry ALSO fails, the problem was never the rng layout
            # (corrupt/mismatched params) — surface the original error, not
            # the retry's secondary one.
            alt = 4 if np.shape(template["rng"])[-1] == 2 else 2
            template["rng"] = np.zeros(
                np.shape(template["rng"])[:-1] + (alt,), np.uint32
            )
            try:
                payload = ckpt.restore(state_dir, template)
            except Exception:
                raise orig
    else:
        flat, _ = _npz_flat_leaves(os.path.join(path, "state.npz"))
        treedef = jax.tree.structure(template)
        # unflatten is shape-agnostic, so a different saved rng layout
        # rides through; _wrap_saved_rng re-infers its impl below
        payload = jax.tree.unflatten(treedef, flat)
    new_lp = None
    if state.params_lp is not None:
        # the bf16 working copy is DERIVED state (train/state.py) — it is
        # never saved; rebuild it from the restored f32 master
        from dpot_tpu.train.state import cast_working_copy

        lp_dtype = next(
            (
                l.dtype
                for l in jax.tree.leaves(state.params_lp)
                if l.dtype in (jax.numpy.bfloat16, jax.numpy.float16)
            ),
            jax.numpy.bfloat16,
        )
        new_lp = cast_working_copy(payload["params"], lp_dtype)
    return state.replace(
        params=payload["params"],
        opt_state=payload["opt_state"],
        step=jax.numpy.asarray(payload["step"]),
        rng=_wrap_saved_rng(payload["rng"]),
        params_lp=new_lp,
    )


def _npz_flat_leaves(npz_path: str):
    """Flat payload leaves from the npz fallback, in flatten (arr_i) order,
    plus the 'sections' leaf-count map when present."""
    data = np.load(npz_path, allow_pickle=True)
    arr_keys = sorted(
        (k for k in data.files if k.startswith("arr_")),
        key=lambda k: int(k.split("_")[1]),
    )
    flat = [data[k] for k in arr_keys]
    sections = (
        json.loads(str(data["sections"])) if "sections" in data.files else None
    )
    return flat, sections


def restore_params(path: str, params_template: Any) -> Any:
    """Restore only params (for eval / fine-tune warm starts)."""
    path = os.path.abspath(path)
    state_dir = _live_state_dir(path)
    if _HAS_ORBAX and os.path.exists(state_dir):
        ckpt = ocp.StandardCheckpointer()
        # restore without a template -> raw saved pytree; take params
        payload = ckpt.restore(state_dir)
        restored = payload["params"]
        # re-impose the template treedef (orbax returns plain dicts;
        # structure needs no host copy of the leaves)
        treedef = jax.tree.structure(params_template)
        return jax.tree.unflatten(treedef, jax.tree.leaves(restored))
    # fall back to full-state npz. Dict flattening is KEY-SORTED
    # ('opt_state' < 'params' < 'rng' < 'step'), so the params leaves sit
    # AFTER opt_state's — located via the saved per-section leaf counts.
    flat, sections = _npz_flat_leaves(os.path.join(path, "state.npz"))
    if sections is None:
        raise ValueError(
            "legacy state.npz without section metadata cannot be sliced "
            "safely for params-only restore; use restore_checkpoint"
        )
    flat_template, treedef = jax.tree.flatten(jax.device_get(params_template))
    start = 0
    for name in sorted(sections):
        if name == "params":
            break
        start += sections[name]
    leaves = flat[start : start + sections["params"]]
    assert len(leaves) == len(flat_template), (
        len(leaves), len(flat_template),
    )
    return jax.tree.unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# component surgery (reference utils/utilities.py:112-166)
# ---------------------------------------------------------------------------

COMPONENT_PREFIXES = {
    "blocks": ("blocks_",),
    "pos": ("pos_embed",),
    "patch_embed": ("patch_embed",),
    "scale_feats": ("scale_feats_mu", "scale_feats_sigma"),
    "cls_head": ("cls_head_",),
    "time_agg": ("time_agg",),
    "out": ("out_deconv", "out_conv1", "out_conv2"),
}


def load_components(
    target_params: Any,
    source_params: Any,
    components: Sequence[str] = ("blocks", "pos", "time_agg"),
) -> Any:
    """Copy selected top-level components from source into target
    (shape-matching leaves only), mirroring load_components_from_pretrained
    (utilities.py:112-166; default component list finetune.py:103).
    'all' (alone or in the list) selects every component, as the reference
    does (utilities.py:126) — the dpot_finetune recipe relies on it."""
    if components == "all" or "all" in components:
        components = tuple(COMPONENT_PREFIXES)
    prefixes: tuple[str, ...] = ()
    for c in components:
        prefixes += COMPONENT_PREFIXES[c]

    tgt = jax.device_get(target_params)
    src = jax.device_get(source_params)

    def top(d):
        return d["params"] if isinstance(d, dict) and "params" in d else d

    tgt_p, src_p = top(tgt), top(src)
    copied = []
    for key in list(tgt_p.keys()):
        if not any(key.startswith(p) for p in prefixes):
            continue
        if key not in src_p:
            continue
        t_leaves, t_def = jax.tree.flatten(tgt_p[key])
        s_leaves, s_def = jax.tree.flatten(src_p[key])
        if t_def == s_def and all(
            np.shape(a) == np.shape(b) for a, b in zip(t_leaves, s_leaves)
        ):
            tgt_p[key] = src_p[key]
            copied.append(key)
    return tgt, copied
