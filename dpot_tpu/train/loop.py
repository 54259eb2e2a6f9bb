"""The pretraining loop — library form of reference train_temporal.py:100-292.

One function `train(cfg)` drives: dataset mixture -> jitted DP train step
(AR rollout, noise injection) -> per-dataset eval rollouts -> epoch logging
with the reference's scalar names -> orbax checkpointing -> loss-explosion
rollback (train_temporal.py:240-245).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dpot_tpu.data import DataLoader, MixedTemporalDataset
from dpot_tpu.models import build_model
from dpot_tpu.parallel import make_mesh, replicate, shard_batch
from dpot_tpu.train.checkpoint import (
    load_components,
    restore_checkpoint,
    save_checkpoint,
)
from dpot_tpu.train.optimizers import build_optimizer
from dpot_tpu.train.schedules import build_schedule
from dpot_tpu.train.state import TrainState
from dpot_tpu.train.step import make_eval_rollout, make_train_step
from dpot_tpu.utils.config import TrainConfig
from dpot_tpu.utils.metrics_logging import MetricWriter


from dpot_tpu.utils.profiling import fence as _fetch


def _device_snapshot(params, opt_state):
    """Rollback snapshot as DEVICE-side copies: ~2 ms of HBM traffic at
    DPOT-M instead of the ~1.5 GB/epoch host round-trip device_get cost
    (and ~12 GB at H). The copies are fresh buffers, so step-donation of
    the live state never aliases them. Module-level so tests can spy on
    snapshot contents."""
    return jax.tree.map(jnp.copy, (params, opt_state))


def _host_snapshot(params, opt_state):
    """Rollback snapshot as HOST copies — the fallback when a resident
    device copy would crowd HBM (DPOT-H: 12.3 GB of f32 params + Lamb
    moments; doubling that OOMs a 16 GB chip). Costs a device->host
    transfer per snapshot, so pair with a coarse rollback_snapshot_steps.
    Rank-0-safe via utils/profiling.host_fetch."""
    from dpot_tpu.utils.profiling import host_fetch

    return host_fetch((params, opt_state))


def _choose_snapshot_fn(state, writer):
    """Device- vs host-side rollback snapshots: device copies are ~free in
    time but DOUBLE the params+opt HBM residency; switch to host copies
    when the doubled per-device state would exceed ~80% of the chip's
    memory (per-device bytes respect FSDP/TP shard shapes, so an H-scale
    state that is sharded small enough keeps the fast path).
    DPOT_SNAPSHOT_MODE=device|host overrides the heuristic."""
    mode = os.environ.get("DPOT_SNAPSHOT_MODE", "")
    if mode not in ("device", "host"):
        try:
            limit = (jax.devices()[0].memory_stats() or {}).get("bytes_limit")
        except Exception:
            limit = None  # backend without memory stats (CPU): no HBM cap
        mode = "device"
        if limit:
            per_dev = sum(
                int(np.prod(lf.sharding.shard_shape(lf.shape)))
                * lf.dtype.itemsize
                for lf in jax.tree.leaves((state.params, state.opt_state))
            )
            if 2 * per_dev > 0.8 * limit:
                mode = "host"
                writer.text(
                    f"rollback snapshots on HOST: params+opt are "
                    f"{per_dev / 2**30:.1f} GiB/device; a resident device "
                    f"copy would exceed 80% of {limit / 2**30:.1f} GiB HBM"
                )
    return _host_snapshot if mode == "host" else _device_snapshot


def _restore_from_snapshot(snap_tree, live_tree):
    """Revert live params/opt leaves to a snapshot. Device snapshots are
    copied OUT (the restored buffers become the live state and get donated
    next step — restoring the snapshot's own buffers would invalidate it);
    host snapshots are device_put back onto each live leaf's sharding."""

    def put(snap, cur):
        if isinstance(snap, (np.ndarray, np.generic)):
            return jax.device_put(snap, cur.sharding)
        return jnp.copy(snap)

    return jax.tree.map(put, snap_tree, live_tree)


def _opt_steps_per_epoch(cfg: TrainConfig, train_dl, train_ds) -> int:
    """OPTIMIZER steps per epoch — the schedule/resume unit. Equals
    len(train_dl) at steps_per_dispatch=1; with K-fused dispatches the
    loader batches are K*B but tails split back into B-sized single steps,
    so the count stays ceil(n / B) — identical to the K=1 run."""
    if max(cfg.steps_per_dispatch, 1) == 1:
        return max(len(train_dl), 1)
    return max(-(-len(train_ds) // cfg.batch_size), 1)


def build_everything(cfg: TrainConfig, mesh=None, init_params=None):
    """init_params: skip the (expensive, jitted) model.init and start from
    the given tree — callers like cli/finetune that already built/merged
    params avoid a second multi-second init of a big model."""
    train_ds = MixedTemporalDataset(
        cfg.train_paths, cfg.ntrain_list, res=cfg.res, t_in=cfg.T_in,
        t_ar=cfg.T_ar, train=True, data_weights=cfg.data_weights,
    )
    test_dss = [
        MixedTemporalDataset(
            [p],
            [cfg.ntest_list[i]] if cfg.ntest_list else None,
            res=cfg.res, n_channels=train_ds.n_channels, t_in=cfg.T_in,
            t_ar=-1, train=False,
        )
        for i, p in enumerate(cfg.test_paths)
    ]
    # multi-host: every process walks the same global batch order but
    # loads only its 1/process_count slice (reference analogue:
    # accelerate's sharded DataLoader, train_temporal_parallel.py:185)
    shard_kw = dict(
        num_shards=jax.process_count(), shard_index=jax.process_index()
    )
    # steps_per_dispatch=K: the loader hands out K optimizer steps' worth
    # of samples per batch; the loop reshapes (K*B, ...) -> (K, B, ...)
    # host-side (a free numpy view) and fuses the K steps into one device
    # dispatch (train/step.py scan_steps)
    K = max(cfg.steps_per_dispatch, 1)
    # loader architecture (see utils/config.py loader_prefetch): inline +
    # recycled slots on 1-worker hosts, threaded prefetch otherwise
    lp, lr = cfg.loader_prefetch, cfg.loader_slot_ring
    if lp < 0:
        lp = 0 if cfg.num_workers <= 1 else 8
    if lr < 0:
        lr = 2
    train_dl = DataLoader(
        train_ds, cfg.batch_size * K, shuffle=True,
        num_workers=cfg.num_workers, seed=cfg.seed, prefetch=lp,
        slot_ring=lr, **shard_kw,
    )
    test_dls = [
        DataLoader(ds, cfg.batch_size, shuffle=False,
                   num_workers=cfg.num_workers, **shard_kw)
        for ds in test_dss
    ]

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    extra = {}
    if mesh is not None and cfg.mesh_spatial > 1:
        # swap every AFNO mixer to the pencil-decomposed distributed FFT
        # (DPOT only; the extension axis for >128^2 native-res training)
        extra["spatial_mesh"] = mesh
    if mesh is not None and cfg.mesh_pipe > 1:
        # GPipe-scheduled trunk over the 'pipe' axis (DPOT only)
        extra["pipe_mesh"] = mesh
        if cfg.pipe_microbatches:
            extra["pipe_microbatches"] = cfg.pipe_microbatches
    model = build_model(
        cfg.model, img_size=cfg.res, patch_size=cfg.patch_size,
        in_channels=train_ds.n_channels, in_timesteps=cfg.T_in,
        out_timesteps=cfg.T_bundle, embed_dim=cfg.width, modes=cfg.modes,
        depth=cfg.n_layers, n_blocks=cfg.n_blocks, mlp_ratio=cfg.mlp_ratio,
        out_layer_dim=cfg.out_layer_dim, act=cfg.act, n_cls=len(cfg.train_paths),
        normalize=cfg.normalize, use_ln=cfg.use_ln, dtype=dtype,
        remat=cfg.remat, **extra,
    )

    steps_per_epoch = _opt_steps_per_epoch(cfg, train_dl, train_ds)
    sched = build_schedule(
        cfg.lr_method, cfg.lr, steps_per_epoch,
        cfg.epochs,
        warmup_epochs=cfg.warmup_epochs, step_size=cfg.step_size,
        step_gamma=cfg.step_gamma, lr_step_size=cfg.lr_step_size,
    )
    beta1 = cfg.beta1
    if cfg.lr_method == "cycle" and cfg.cycle_momentum:
        # reference-exact: OneCycleLR cycles beta1 (see Config.cycle_momentum)
        from dpot_tpu.train.schedules import onecycle_momentum

        beta1 = onecycle_momentum(
            steps_per_epoch * cfg.epochs, cfg.warmup_epochs, cfg.epochs
        )
    tx = build_optimizer(
        cfg.opt, sched, beta1, cfg.beta2, grad_clip=cfg.grad_clip,
        weight_decay=cfg.weight_decay,
        moment_dtype=(
            jnp.bfloat16 if cfg.opt_moment_dtype == "bfloat16" else None
        ),
    )

    if init_params is not None:
        params = init_params
    else:
        x0 = jnp.zeros(
            (cfg.batch_size, cfg.res, cfg.res, cfg.T_in, train_ds.n_channels),
            jnp.float32,
        )
        params = model.init(jax.random.key(cfg.seed), x0)
    from dpot_tpu.train.state import training_key

    state = TrainState.create(model.apply, params, tx, training_key(cfg.seed + 1))
    return model, state, sched, train_dl, test_dls, train_ds


def train(
    cfg: TrainConfig,
    log_dir: Optional[str] = None,
    init_params=None,
) -> dict:
    """init_params: caller-provided starting params (e.g. cli/finetune's
    component-merged tree) — takes precedence over cfg.resume_path."""
    mesh = make_mesh(
        data=cfg.mesh_data, spatial=cfg.mesh_spatial, model=cfg.mesh_model,
        pipe=cfg.mesh_pipe,
    )
    model, state, sched, train_dl, test_dls, train_ds = build_everything(
        cfg, mesh=mesh, init_params=init_params
    )

    if log_dir is None and cfg.use_writer:
        log_dir = os.path.join(
            cfg.log_path or "./logs",
            time.strftime("%m%d_%H_%M_%S") + cfg.comment,
        )
    writer = MetricWriter(log_dir)
    ckpt_dir = os.path.join(log_dir, "model") if log_dir else None
    # multihost checkpointing: a cross-process-SHARDED state (FSDP/TP over
    # a multi-process mesh) makes the host fetch a COLLECTIVE (sharded
    # leaves all-gather, utils/profiling.host_fetch), so every process
    # must call save_checkpoint — only process 0 writes (checkpoint.py).
    # dp-replicated states stay process-0-only (fully readable there).
    dist_sharded = (
        jax.process_count() > 1 and cfg.shard_params != "replicate"
    )
    if ckpt_dir and jax.process_index() != 0 and not dist_sharded:
        ckpt_dir = None
    ckpt_writer = None
    if ckpt_dir and cfg.async_ckpt and jax.process_index() == 0:
        from dpot_tpu.train.checkpoint import AsyncCheckpointWriter

        ckpt_writer = AsyncCheckpointWriter()

    K = max(cfg.steps_per_dispatch, 1)
    if K > 1:
        assert jax.process_count() == 1, (
            "steps_per_dispatch>1 is single-process only (multihost batch "
            "assembly ships per-host shards batch-by-batch)"
        )
        assert cfg.mesh_spatial == 1, (
            "steps_per_dispatch does not compose with spatial sharding"
        )

    start_epoch = 0
    steps_per_epoch = _opt_steps_per_epoch(cfg, train_dl, train_ds)
    if init_params is not None:
        # build_everything already created the state from these params
        writer.text("starting from caller-provided params")
    elif cfg.resume_path:
        # FULL resume: params + opt state (moments) + step (OneCycle/other
        # schedule position) + PRNG (noise stream). The loop then continues
        # at the epoch the checkpoint was taken, with the data loader
        # positioned on that epoch's permutation — a preempted run's
        # trajectory continues step-for-step (tests/test_checkpoint_loop.py
        # ::test_kill_and_resume_trajectory).
        state = restore_checkpoint(cfg.resume_path, state)
        # rank-0-safe fetch (plain device_get of the rank-0 step counter
        # is unimplemented on the tunneled TPU backend)
        done = int(_fetch(state.step))
        start_epoch = min(done // steps_per_epoch, cfg.epochs)
        train_dl.set_epoch(start_epoch)
        writer.text(
            f"resumed full train state from {cfg.resume_path}: step {done}, "
            f"continuing at epoch {start_epoch}"
        )
    elif cfg.init_from:
        from dpot_tpu.train.checkpoint import restore_params

        src = restore_params(cfg.init_from, state.params)
        state = state.replace(params=src)
        writer.text(f"warm-started params from {cfg.init_from}")

    # parameter placement strategy (restore/init above already produced the
    # host-side tree, so placement here covers resumed runs too; on
    # multi-process meshes place_state assembles global sharded arrays
    # from the host copies — parallel/fsdp._put_global)
    if cfg.shard_params == "fsdp":
        from dpot_tpu.parallel.fsdp import shard_state_fsdp

        state = shard_state_fsdp(state, mesh)
    elif cfg.shard_params in ("tp", "tp_fsdp"):
        from dpot_tpu.parallel.tensor import shard_state_tp

        state = shard_state_tp(
            state, mesh,
            fsdp_axis="data" if cfg.shard_params == "tp_fsdp" else None,
        )
    else:
        assert cfg.shard_params == "replicate", (
            f"unknown shard_params {cfg.shard_params!r} "
            "(replicate | fsdp | tp | tp_fsdp)"
        )
        state = replicate(state, mesh)
    # time-major corpora ship train batches as (B, T, spatial..., C) and
    # the step transposes on device (ingest fast path). Spatial sharding
    # expects the standard host layout — force it off there.
    time_major = bool(getattr(train_ds, "time_major_batches", False))
    if time_major and cfg.mesh_spatial > 1:
        train_ds.time_major_batches = False
        time_major = False
    # wire-format savings (H2D bytes are a first-order cost when the chip
    # is remote or the host feeds many chips): ship x in bf16 when the
    # compute dtype is bf16 anyway (the model's first matmul casts), and
    # skip the msk transfer entirely when the dataset declares train
    # masks all-ones (loss runs unmasked — bit-identical)
    wire = cfg.wire_dtype
    if wire == "auto":
        wire = "bfloat16_x" if cfg.dtype == "bfloat16" else "float32"
    wire_x = jnp.bfloat16 if wire.startswith("bfloat16") else None
    wire_y = jnp.bfloat16 if wire == "bfloat16" else None
    # fold the wire cast into the loader's assembly copy (np.copyto
    # converts in-pass): the loop's astype below then skips — one pass
    # over the batch bytes instead of two on the ingest core
    if wire_x is not None:
        train_dl.x_dtype = np.dtype(wire_x)
    if wire_y is not None:
        train_dl.y_dtype = np.dtype(wire_y)
    ones_mask = bool(getattr(train_ds, "train_masks_are_ones", False))
    step_kw = dict(
        t_bundle=cfg.T_bundle, noise_scale=cfg.noise_scale,
        time_major=time_major, ones_mask=ones_mask,
        grad_accum=cfg.grad_accum,
    )
    step_fn = make_train_step(scan_steps=K, **step_kw)
    # trailing partial loader batches can't fill a K-step dispatch; they
    # run B-sized chunks through a plain single-step program instead, so
    # the epoch consumes exactly the sample stream a K=1 run would
    tail_step_fn = make_train_step(**step_kw) if K > 1 else step_fn
    # ...and a tail whose size doesn't divide grad_accum falls back to the
    # unaccumulated program (same update, full-batch activations — fine
    # for one small tail batch; jit compiles it only if it's ever hit)
    noaccum_step_fn = (
        make_train_step(**{**step_kw, "grad_accum": 1})
        if cfg.grad_accum > 1
        else tail_step_fn
    )
    roll_fn = make_eval_rollout(t_bundle=cfg.T_bundle)

    if jax.process_count() > 1:
        from dpot_tpu.parallel.multihost import global_batch_from_local

        def place(b, spatial_sharded=False, scan_axis=False):
            # per-host numpy shards -> one global sharded jax.Array
            assert not scan_axis  # K>1 asserts single-process above
            return global_batch_from_local(b, mesh, spatial_sharded)
    else:
        def place(b, spatial_sharded=False, scan_axis=False):
            return shard_batch(b, mesh, spatial_sharded, scan_axis=scan_axis)

    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
    writer.text(f"model {cfg.model} params {n_params/1e6:.2f}M devices {mesh.devices.size}")

    it = start_epoch * steps_per_epoch  # global step (== state.step on resume)
    loss_ema = None  # running mean of per-batch losses (failure detector)
    rollback_on = cfg.rollback_factor > 0 and cfg.rollback_snapshot_steps >= 0
    take_snapshot = _choose_snapshot_fn(state, writer) if rollback_on else None
    last_good = (
        take_snapshot(state.params, state.opt_state) if rollback_on else None
    )
    history = {}

    for ep in range(start_epoch, cfg.epochs):
        t1 = t_1 = time.perf_counter()
        t_load = t_train = 0.0
        train_l2_step = train_l2_full = 0.0
        train_seen = 0  # samples actually consumed (the sharded loader
        # skips non-divisible trailing batches; normalizing by the dataset
        # size would bias the reported losses low)
        steps_per_sample = 1.0

        # one-step-lagged metric fetch: step i+1 is dispatched before step
        # i's loss is read back, so the device pipeline never drains (the
        # reference's .item() per step serializes; here only the rollback
        # check lags one dispatch)
        pending = None  # (aux, per_step_batch, steps_per_sample, it_at_dispatch)

        def drain(pending):
            nonlocal train_l2_step, train_l2_full, train_seen, loss_ema, state
            if pending is None:
                return
            aux_p, bsz, sps, it_d = pending
            ls, lf = aux_p["loss_step"], aux_p["loss_full"]
            if getattr(ls, "ndim", 0):
                # fused K-step dispatch: per-step loss vectors, fetched in
                # one transfer each (rank-1 D2H is fine on every backend)
                ls_v = np.asarray(jax.device_get(ls))
                lf_v = np.asarray(jax.device_get(lf))
            else:
                ls_v = np.array([_fetch(ls)])
                lf_v = np.array([_fetch(lf)])
            kk = len(ls_v)
            for j in range(kk):
                loss_v = float(ls_v[j])
                # accumulate per sub-step, BEFORE the explosion check stops
                # the loop — the exploded value itself counts (as at K=1),
                # but the rolled-back trajectory's remaining sub-steps
                # must not poison the epoch metrics
                train_l2_step += loss_v
                train_l2_full += float(lf_v[j])
                train_seen += bsz
                step_idx = it_d - kk + 1 + j  # global optimizer step
                if writer.log_dir:
                    writer.scalar(
                        "train_loss_step", loss_v / (bsz * sps), step_idx
                    )
                    writer.scalar(
                        "train_loss_full", float(lf_v[j]) / bsz, step_idx
                    )
                # failure detection (cfg.rollback_factor; see config.py —
                # the reference analogue train_temporal.py:240-245 is dead
                # code). Compare against an EMA, not the previous batch:
                # mixture batches legitimately differ by >10x between
                # datasets. A non-finite loss is never a false positive —
                # trigger the restore even before the EMA/warmup have
                # populated (a run that NaNs on its first batches must not
                # train NaN to completion just because no finite loss ever
                # seeded the EMA).
                exploded = rollback_on and (
                    not np.isfinite(loss_v)
                    or (
                        loss_ema is not None
                        and step_idx > cfg.rollback_warmup_steps
                        and loss_v > cfg.rollback_factor * loss_ema
                    )
                )
                if exploded:
                    ema_s = (
                        f"{loss_ema:.3g}" if loss_ema is not None else "unset"
                    )
                    writer.text(
                        f"loss explodes ({loss_v:.3g} vs ema {ema_s}), "
                        "restoring previous good state"
                    )
                    state = state.replace(
                        params=_restore_from_snapshot(
                            last_good[0], state.params
                        ),
                        opt_state=_restore_from_snapshot(
                            last_good[1], state.opt_state
                        ),
                    )
                    # the dispatch's remaining sub-steps belong to the
                    # rolled-back trajectory — don't feed them to the EMA
                    break
                elif np.isfinite(loss_v):
                    loss_ema = (
                        loss_v
                        if loss_ema is None
                        else 0.9 * loss_ema + 0.1 * loss_v
                    )

        def dispatch_units(dl):
            """Loader batches -> dispatch units (x, y, msk, cls, k_unit):
            a full K*B batch becomes ONE fused K-step dispatch; anything
            else (the trailing partial) splits into B-sized single-step
            chunks so the epoch's sample stream matches a K=1 run."""
            bs = cfg.batch_size
            for x_, y_, msk_, cls_ in dl:
                if K == 1 or x_.shape[0] == K * bs:
                    yield x_, y_, msk_, cls_, K
                else:
                    for i in range(0, x_.shape[0], bs):
                        yield (
                            x_[i : i + bs], y_[i : i + bs],
                            msk_[i : i + bs], cls_[i : i + bs], 1,
                        )

        for x, y, msk, cls, k_unit in dispatch_units(train_dl):
            t_load += time.perf_counter() - t_1
            t_1 = time.perf_counter()
            host_batch = {"x": x, "y": y, "msk": msk, "cls": cls}
            if ones_mask:
                del host_batch["msk"]
            if wire_x is not None and x.dtype != np.dtype(wire_x):
                host_batch["x"] = np.asarray(x).astype(wire_x)
            if wire_y is not None and y.dtype != np.dtype(wire_y):
                host_batch["y"] = np.asarray(y).astype(wire_y)
            t_ar_axis = 1 if time_major else y.ndim - 2
            steps_per_sample = y.shape[t_ar_axis] / cfg.T_bundle
            if k_unit > 1:
                # (K*B, ...) -> (K, B, ...): a free numpy view; sharded
                # over 'data' on axis 1 (parallel/mesh.batch_spec)
                host_batch = {
                    k2: np.reshape(
                        v, (k_unit, cfg.batch_size) + np.shape(v)[1:]
                    )
                    for k2, v in host_batch.items()
                }
                batch = place(host_batch, scan_axis=True)
                state, aux = step_fn(state, batch)
            else:
                batch = place(
                    host_batch, spatial_sharded=cfg.mesh_spatial > 1
                )
                fn = tail_step_fn
                if cfg.grad_accum > 1 and x.shape[0] % cfg.grad_accum:
                    fn = noaccum_step_fn
                state, aux = fn(state, batch)
            prev_it = it
            it += k_unit
            drain(pending)
            if (
                rollback_on
                and cfg.rollback_snapshot_steps > 0
                and (it // cfg.rollback_snapshot_steps)
                != (prev_it // cfg.rollback_snapshot_steps)
            ):
                # mid-epoch snapshot: an explosion replays at most
                # rollback_snapshot_steps (+K-1) steps (taken AFTER drain
                # so a just-detected explosion snapshots the restored state)
                last_good = take_snapshot(state.params, state.opt_state)
            # loss_step sums over the GLOBAL per-step batch; x is this
            # host's shard of k_unit steps' samples
            pending = (
                aux,
                x.shape[0] // k_unit * jax.process_count(),
                steps_per_sample,
                it,
            )
            t_train += time.perf_counter() - t_1
            t_1 = time.perf_counter()
        drain(pending)

        # ---- eval ----
        test_l2_steps, test_l2_fulls = [], []
        host_params = state.params
        for di, dl in enumerate(test_dls):
            s_sum = f_sum = 0.0
            n_seen = 0
            t_y = None
            for x, y, msk, _ in dl:
                # per-dataset normalization below divides by the LAST
                # batch's rollout length — sound only while every batch of
                # a test dataset shares t_test (true today: t_test is a
                # per-dataset constant); keep that invariant loud
                assert t_y in (None, y.shape[-2]), (
                    f"eval batches of {cfg.test_paths[di]} mix rollout "
                    f"lengths {t_y} vs {y.shape[-2]} — loss normalization "
                    "would silently skew"
                )
                t_y = y.shape[-2]
                out = roll_fn(
                    model.apply, host_params,
                    place({"x": x, "y": y, "msk": msk}),
                )
                s_sum += _fetch(out["loss_step"])
                f_sum += _fetch(out["loss_full"])
                if (
                    cfg.viz_dir
                    and ep == cfg.epochs - 1
                    and n_seen == 0
                    and jax.process_index() == 0
                ):
                    # final-epoch snapshot per test set (cli/evaluate's
                    # --viz_dir surface, available from training too)
                    from dpot_tpu.utils.viz import save_eval_viz

                    save_eval_viz(
                        np.asarray(out["pred"][0] * msk[0]),
                        np.asarray(y[0] * msk[0]),
                        cfg.viz_dir, cfg.test_paths[di],
                    )
                n_seen += x.shape[0] * jax.process_count()
            if n_seen == 0:
                # the sharded loader skipped every batch (test set smaller
                # than a divisible global batch): say so instead of
                # reporting a perfect 0.0 from an empty sum
                writer.text(
                    f"eval dataset {cfg.test_paths[di]} produced no batches "
                    "under this batch/shard config; metrics omitted"
                )
                test_l2_steps.append(float("nan"))
                test_l2_fulls.append(float("nan"))
                continue
            steps = max(t_y / cfg.T_bundle, 1)
            test_l2_steps.append(s_sum / n_seen / steps)
            test_l2_fulls.append(f_sum / n_seen)
            if writer.log_dir:
                writer.scalar(
                    f"test_loss_step_{cfg.test_paths[di]}", test_l2_steps[-1], ep
                )
                writer.scalar(
                    f"test_loss_full_{cfg.test_paths[di]}", test_l2_fulls[-1], ep
                )

        if ckpt_dir and (ep % cfg.save_every == 0 or ep == cfg.epochs - 1):
            target = ckpt_dir
            if cfg.ckpt_bucket_epochs > 0:
                target = f"{ckpt_dir}_{ep // cfg.ckpt_bucket_epochs}"
            save_checkpoint(target, state, config=vars(cfg), writer=ckpt_writer)
        if rollback_on and cfg.rollback_snapshot_steps == 0:
            last_good = take_snapshot(state.params, state.opt_state)

        t_test = time.perf_counter() - t_1
        lr_now = _fetch(sched(state.step)) if callable(sched) else sched
        tls = train_l2_step / max(train_seen, 1) / steps_per_sample
        tlf = train_l2_full / max(train_seen, 1)
        writer.text(
            "epoch {}, time {:.5f}, lr {:.2e}, train l2 step {:.5f} train l2 full {:.5f}, "
            "test l2 step {} test l2 full {}, time train avg {:.5f} load avg {:.5f} test {:.5f}".format(
                ep, time.perf_counter() - t1, lr_now, tls, tlf,
                ", ".join(f"{v:.5f}" for v in test_l2_steps),
                ", ".join(f"{v:.5f}" for v in test_l2_fulls),
                t_train / max(len(train_dl), 1),
                t_load / max(len(train_dl), 1), t_test,
            )
        )
        history = {
            "epoch": ep,
            "train_l2_step": tls,
            "train_l2_full": tlf,
            "test_l2_steps": test_l2_steps,
            "test_l2_fulls": test_l2_fulls,
        }

    if ckpt_writer is not None:
        ckpt_writer.close()  # fence: checkpoints are on disk once we return
    writer.close()
    return {"state": state, "model": model, **history}
