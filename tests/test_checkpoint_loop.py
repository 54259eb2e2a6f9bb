"""Checkpoint round-trip (full train state incl. step/PRNG — the thing the
reference loses, train_temporal.py:287) + end-to-end train loop smoke +
component surgery."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from dpot_tpu.models.dpot import DPOTNet
from dpot_tpu.train.checkpoint import (
    load_components,
    restore_checkpoint,
    restore_params,
    save_checkpoint,
)
from dpot_tpu.train.optimizers import build_optimizer
from dpot_tpu.train.state import TrainState
from dpot_tpu.train.step import make_train_step
from dpot_tpu.utils.config import TrainConfig, expand_tasks
from dpot_tpu.train.loop import train


def small_state(seed=0):
    model = DPOTNet(
        img_size=16, patch_size=4, in_channels=1, out_channels=1,
        in_timesteps=4, embed_dim=32, depth=1, n_blocks=4, modes=4, n_cls=2,
    )
    x = jnp.zeros((2, 16, 16, 4, 1))
    params = model.init(jax.random.key(seed), x)
    tx = build_optimizer("adam", 1e-3, grad_clip=1.0)
    return model, TrainState.create(model.apply, params, tx, jax.random.key(seed))


def test_checkpoint_roundtrip(tmp_path):
    model, state = small_state()
    batch = {
        "x": jnp.ones((2, 16, 16, 4, 1)),
        "y": jnp.ones((2, 16, 16, 1, 1)),
        "msk": jnp.ones((2, 16, 16, 1, 1)),
        "cls": jnp.zeros((2,), jnp.int32),
    }
    step = make_train_step(donate=False)
    state, _ = step(state, batch)
    state, _ = step(state, batch)
    save_checkpoint(str(tmp_path / "ck"), state, config={"a": 1})

    _, fresh = small_state(seed=7)
    restored = restore_checkpoint(str(tmp_path / "ck"), fresh)
    assert int(restored.step) == 2
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # PRNG continuity: next random draw identical
    k1 = jax.random.normal(jax.random.split(state.rng)[1], (3,))
    k2 = jax.random.normal(jax.random.split(restored.rng)[1], (3,))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))

    # params-only restore
    p = restore_params(str(tmp_path / "ck"), fresh.params)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(p)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )


def test_async_checkpoint_writer(tmp_path):
    """Background checkpoint writes: wait() fences a complete on-disk
    state; a second save to the same path atomically replaces the first
    (full restore equals the LATEST saved state, including step/rng)."""
    from dpot_tpu.train.checkpoint import AsyncCheckpointWriter

    model, state = small_state()
    batch = {
        "x": jnp.ones((2, 16, 16, 4, 1)),
        "y": jnp.ones((2, 16, 16, 1, 1)),
        "msk": jnp.ones((2, 16, 16, 1, 1)),
        "cls": jnp.zeros((2,), jnp.int32),
    }
    step = make_train_step(donate=False)
    w = AsyncCheckpointWriter()
    path = str(tmp_path / "ck")
    state, _ = step(state, batch)
    save_checkpoint(path, state, config={"v": 1}, writer=w)
    state, _ = step(state, batch)
    save_checkpoint(path, state, config={"v": 2}, writer=w)
    w.close()

    _, fresh = small_state(seed=7)
    restored = restore_checkpoint(path, fresh)
    assert int(restored.step) == 2  # the LATEST save won
    for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(restored.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    import json as _json

    with open(tmp_path / "ck" / "params.json") as f:
        assert _json.load(f)["v"] == 2

    # a failed write surfaces on the caller thread, not silently
    w2 = AsyncCheckpointWriter()
    bad = str(tmp_path / "ck2")
    import pathlib

    pathlib.Path(bad).write_text("a file where the ckpt dir must go")
    save_checkpoint(bad, state, writer=w2)
    try:
        w2.wait()
        raise AssertionError("expected the async write failure to surface")
    except RuntimeError as e:
        assert "async checkpoint write failed" in str(e)


def test_component_surgery():
    _, s1 = small_state(seed=0)
    _, s2 = small_state(seed=9)
    merged, copied = load_components(
        s1.params, s2.params, components=("blocks", "pos", "time_agg")
    )
    assert any(k.startswith("blocks_") for k in copied)
    assert "pos_embed" in copied
    m = merged["params"]
    s2p = jax.device_get(s2.params)["params"]
    s1p = jax.device_get(s1.params)["params"]
    np.testing.assert_array_equal(
        np.asarray(m["pos_embed"]), np.asarray(s2p["pos_embed"])
    )
    # untouched component stays from target
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(m["out_conv1"])[0]),
        np.asarray(jax.tree.leaves(s1p["out_conv1"])[0]),
    )


def test_train_loop_end_to_end(tmp_path):
    cfg = TrainConfig(
        model="DPOT", train_paths=["synthetic_loop"], res=16, patch_size=4,
        width=32, n_layers=1, n_blocks=4, modes=4, T_in=6, epochs=1,
        batch_size=8, num_workers=2, lr=1e-3, opt="adam", use_writer=True,
        log_path=str(tmp_path),
    )
    out = train(cfg, log_dir=str(tmp_path / "run"))
    assert np.isfinite(out["train_l2_step"])
    assert (tmp_path / "run" / "metrics.jsonl").exists()
    assert (tmp_path / "run" / "model").exists()


def test_kill_and_resume_trajectory(tmp_path):
    """Full-state resume (VERDICT r2 #2): train 4 epochs uninterrupted vs
    train 2 epochs -> checkpoint -> resume for 2 more. The resumed loss
    trajectory must match the uninterrupted run step-for-step, which
    requires ALL of: params, Adam moments, schedule position (step), the
    noise PRNG stream, and the data loader's epoch permutation to be
    restored — params-only restore fails every one of those."""
    import json

    from dpot_tpu.data.registry import make_synthetic_spec

    make_synthetic_spec(
        "resume_traj", train_size=16, test_size=8, t_total=12, t_test=2,
        in_size=(16, 16), n_channels=1,
    )
    # The resume config must equal the original (the OneCycle schedule is
    # built from cfg.epochs — resuming a 4-epoch run with epochs=2 is a
    # DIFFERENT schedule). ckpt_bucket_epochs=2 keeps the mid-run
    # checkpoint (model_0, state after epoch 1) around, simulating a kill
    # at the 2-epoch mark of the same 4-epoch job.
    base = dict(
        model="DPOT", train_paths=["resume_traj"], res=16, patch_size=4,
        width=32, n_layers=1, n_blocks=4, modes=4, T_in=6, batch_size=8,
        num_workers=2, lr=1e-3, opt="adam", lr_method="cycle",
        noise_scale=0.05, rollback_factor=0.0, use_writer=True, seed=3,
        epochs=4, ckpt_bucket_epochs=2,
    )

    def step_losses(d):
        out = []
        with open(d / "metrics.jsonl") as f:
            for line in f:
                r = json.loads(line)
                if r["tag"] == "train_loss_step":
                    out.append(r["value"])
        return out

    train(TrainConfig(**base), log_dir=str(tmp_path / "full"))
    full = step_losses(tmp_path / "full")

    train(
        TrainConfig(
            resume_path=str(tmp_path / "full" / "model_0"), **base
        ),
        log_dir=str(tmp_path / "resumed"),
    )
    resumed = step_losses(tmp_path / "resumed")

    assert len(full) == 8 and len(resumed) == 4  # 2 steps/epoch
    np.testing.assert_allclose(resumed, full[4:], rtol=0, atol=1e-6)


def test_init_from_params_only(tmp_path):
    """--init_from warm-starts params but NOT the optimizer/step/PRNG."""
    from dpot_tpu.data.registry import make_synthetic_spec

    make_synthetic_spec(
        "warmstart", train_size=16, test_size=8, t_total=12, t_test=2,
        in_size=(16, 16), n_channels=1,
    )
    base = dict(
        model="DPOT", train_paths=["warmstart"], res=16, patch_size=4,
        width=32, n_layers=1, n_blocks=4, modes=4, T_in=6, batch_size=8,
        num_workers=2, lr=1e-3, opt="adam", use_writer=True,
    )
    out1 = train(TrainConfig(epochs=2, **base), log_dir=str(tmp_path / "a"))
    src = str(tmp_path / "a" / "model")
    out2 = train(
        TrainConfig(epochs=1, init_from=src, **base),
        log_dir=str(tmp_path / "b"),
    )
    # warm start: epoch-0 loss of run 2 is already below run 1's epoch-0
    # (params came from 2 trained epochs), and the step counter restarted
    assert out2["epoch"] == 0
    assert int(jax.device_get(out2["state"].step)) == 2  # 1 epoch * 2 steps
    assert np.isfinite(out2["train_l2_step"])


def test_midepoch_explosion_rollback(tmp_path, monkeypatch):
    """Step-interval rollback snapshots (VERDICT r2 weak #5): a mid-epoch
    loss explosion restores a state at most rollback_snapshot_steps old —
    not the epoch start. Batch 5's loss is forged to 1e9; with snapshots
    every 2 steps the restore target is the it=4 snapshot, so the it=6
    snapshot (taken right after the restore) must equal it exactly."""
    import dpot_tpu.train.loop as loop_mod
    from dpot_tpu.data.registry import make_synthetic_spec

    make_synthetic_spec(
        "boom", train_size=48, test_size=8, t_total=12, t_test=2,
        in_size=(16, 16), n_channels=1,
    )

    calls = {"n": 0}
    real_fetch = loop_mod._fetch

    def fake_fetch(x):
        calls["n"] += 1
        # fetch order during the train phase: 2 per drained batch
        # (loss_step, loss_full); batch 5's loss_step is call #9
        if calls["n"] == 9:
            return 1e9
        return real_fetch(x)

    snaps = []
    real_snap = loop_mod._device_snapshot

    def spy_snap(params, opt_state):
        out = real_snap(params, opt_state)
        snaps.append(jax.device_get(out[0]))
        return out

    monkeypatch.setattr(loop_mod, "_fetch", fake_fetch)
    monkeypatch.setattr(loop_mod, "_device_snapshot", spy_snap)

    cfg = TrainConfig(
        model="DPOT", train_paths=["boom"], res=16, patch_size=4, width=32,
        n_layers=1, n_blocks=4, modes=4, T_in=6, batch_size=8, epochs=1,
        num_workers=2, lr=1e-3, opt="adam", use_writer=True,
        rollback_factor=2.0, rollback_warmup_steps=1,
        rollback_snapshot_steps=2,
    )
    out = train(cfg, log_dir=str(tmp_path / "run"))

    logs = (tmp_path / "run" / "logs.txt").read_text()
    assert "restoring previous good state" in logs
    # snapshots: initial + it=2,4,6 (6 batches of 8 over 48 samples)
    assert len(snaps) == 4
    flat = [jax.tree.leaves(s) for s in snaps]
    # training moved params between the it=2 and it=4 snapshots...
    assert any(
        not np.array_equal(a, b) for a, b in zip(flat[1], flat[2])
    )
    # ...but the it=6 snapshot (taken right after the rollback restore)
    # is bit-identical to the it=4 one: the restore reverted exactly to
    # the <=2-step-old snapshot, not to the epoch start
    for a, b in zip(flat[2], flat[3]):
        np.testing.assert_array_equal(a, b)
    assert np.isfinite(out["train_l2_step"])


def test_explosion_rollback_host_snapshots(tmp_path, monkeypatch):
    """Host-side snapshot fallback (the H-scale path where a resident
    device copy would OOM HBM): with DPOT_SNAPSHOT_MODE=host the forged
    explosion must restore exactly from numpy snapshots — device_put back
    onto the live leaves' shardings, including the rank-0 opt counters."""
    import dpot_tpu.train.loop as loop_mod
    from dpot_tpu.data.registry import make_synthetic_spec

    make_synthetic_spec(
        "boomh", train_size=48, test_size=8, t_total=12, t_test=2,
        in_size=(16, 16), n_channels=1,
    )

    calls = {"n": 0}
    real_fetch = loop_mod._fetch

    def fake_fetch(x):
        calls["n"] += 1
        if calls["n"] == 9:  # batch 5's loss_step (2 fetches per batch)
            return 1e9
        return real_fetch(x)

    snaps = []
    real_snap = loop_mod._host_snapshot

    def spy_snap(params, opt_state):
        out = real_snap(params, opt_state)
        assert all(
            isinstance(lf, (np.ndarray, np.generic))
            for lf in jax.tree.leaves(out)
        ), "host snapshot must hold numpy leaves, not device arrays"
        snaps.append(out[0])
        return out

    monkeypatch.setenv("DPOT_SNAPSHOT_MODE", "host")
    monkeypatch.setattr(loop_mod, "_fetch", fake_fetch)
    monkeypatch.setattr(loop_mod, "_host_snapshot", spy_snap)

    cfg = TrainConfig(
        model="DPOT", train_paths=["boomh"], res=16, patch_size=4, width=32,
        n_layers=1, n_blocks=4, modes=4, T_in=6, batch_size=8, epochs=1,
        num_workers=2, lr=1e-3, opt="adam", use_writer=True,
        rollback_factor=2.0, rollback_warmup_steps=1,
        rollback_snapshot_steps=2,
    )
    out = train(cfg, log_dir=str(tmp_path / "run"))

    logs = (tmp_path / "run" / "logs.txt").read_text()
    assert "restoring previous good state" in logs
    assert len(snaps) == 4  # initial + it=2,4,6
    flat = [jax.tree.leaves(s) for s in snaps]
    assert any(not np.array_equal(a, b) for a, b in zip(flat[1], flat[2]))
    # the it=6 snapshot (taken right after the restore) is bit-identical
    # to the it=4 one: the host round-trip restored exactly
    for a, b in zip(flat[2], flat[3]):
        np.testing.assert_array_equal(a, b)
    assert np.isfinite(out["train_l2_step"])


def test_sweep_expansion():
    y = {
        "base": 1,
        "tasks": {"lr": [1e-3, 1e-4], "model": ["DPOT", "FNO"], "epochs": 5},
    }
    jobs = expand_tasks(y)
    assert len(jobs) == 4
    assert all(j["epochs"] == 5 and j["base"] == 1 for j in jobs)
    assert {(j["lr"], j["model"]) for j in jobs} == {
        (1e-3, "DPOT"), (1e-3, "FNO"), (1e-4, "DPOT"), (1e-4, "FNO")
    }


def test_checkpoint_rng_cross_platform_impl(tmp_path):
    """A checkpoint saved under the TPU rng impl (rbg, uint32[4] key data)
    must restore on a platform whose fresh template uses threefry
    (uint32[2]) — and keep the exact saved noise stream (train/state.py
    training_key is platform-dependent)."""
    model, state = small_state()
    rbg_key = jax.random.key(7, impl="rbg")
    state_rbg = state.replace(rng=rbg_key)
    save_checkpoint(str(tmp_path / "ck"), state_rbg)

    # fresh state on this (CPU) platform -> threefry template
    _, fresh = small_state(seed=1)
    assert jax.random.key_data(fresh.rng).shape[-1] == 2
    restored = restore_checkpoint(str(tmp_path / "ck"), fresh)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(restored.rng)),
        np.asarray(jax.random.key_data(rbg_key)),
    )
    # the stream continues identically
    a = jax.random.normal(restored.rng, (4,))
    b = jax.random.normal(rbg_key, (4,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_crash_mid_swap_falls_back_to_state_new(tmp_path):
    """A crash between _write_payload's rmtree('state') and the rename
    leaves only the completed 'state.new'; restore (full and params-only)
    must fall back to it instead of failing or restoring nothing."""
    import shutil

    import dpot_tpu.train.checkpoint as ck

    if not ck._HAS_ORBAX:
        import pytest

        pytest.skip("orbax path only — npz swap is a single os.replace")

    model, state = small_state()
    path = str(tmp_path / "ck")
    save_checkpoint(path, state, config={"v": 1})
    # simulate the crash window: new state fully written, old one removed,
    # rename never happened
    os.rename(os.path.join(path, "state"), os.path.join(path, "state.new"))
    assert not os.path.exists(os.path.join(path, "state"))

    _, fresh = small_state(seed=5)
    restored = restore_checkpoint(path, fresh)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    p = restore_params(path, fresh.params)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(p)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )
    # a later successful save cleans up and wins over the stale fallback
    state2 = state.replace(step=state.step + 5)
    save_checkpoint(path, state2, config={"v": 2})
    assert os.path.exists(os.path.join(path, "state"))
    restored2 = restore_checkpoint(path, fresh)
    assert int(restored2.step) == int(jax.device_get(state2.step))
    shutil.rmtree(path)


def test_interrupted_swap_promoted_before_next_write(tmp_path, monkeypatch):
    """After a crash mid-swap (only state.new on disk), the NEXT save must
    first complete the interrupted swap — so even if that save's write
    FAILS, a restorable checkpoint still exists (the old behavior rmtree'd
    state.new, the only valid checkpoint, before writing)."""
    import dpot_tpu.train.checkpoint as ck

    if not ck._HAS_ORBAX:
        import pytest

        pytest.skip("orbax path only")

    model, state = small_state()
    path = str(tmp_path / "ck")
    save_checkpoint(path, state)
    os.rename(os.path.join(path, "state"), os.path.join(path, "state.new"))

    class BoomCkpt:
        def save(self, *a, **k):
            raise OSError("disk full")

        def wait_until_finished(self):
            pass

    monkeypatch.setattr(ck.ocp, "StandardCheckpointer", BoomCkpt)
    try:
        save_checkpoint(path, state.replace(step=state.step + 1))
        raise AssertionError("expected the forged write failure")
    except OSError:
        pass
    # the interrupted swap was completed before the failing write started
    assert os.path.exists(os.path.join(path, "state"))
    monkeypatch.undo()
    _, fresh = small_state(seed=5)
    restored = restore_checkpoint(path, fresh)
    assert int(restored.step) == int(jax.device_get(state.step))


def test_nan_from_first_batch_triggers_rollback(tmp_path, monkeypatch):
    """A run whose loss is non-finite from the very first batches must
    trigger the rollback restore even though no finite loss ever populated
    the EMA (previously `exploded` required loss_ema is not None, so an
    immediately-NaN run trained NaN to completion)."""
    import dpot_tpu.train.loop as loop_mod
    from dpot_tpu.data.registry import make_synthetic_spec

    make_synthetic_spec(
        "nan0", train_size=32, test_size=8, t_total=12, t_test=2,
        in_size=(16, 16), n_channels=1,
    )
    calls = {"n": 0}
    real_fetch = loop_mod._fetch

    def fake_fetch(x):
        calls["n"] += 1
        if calls["n"] <= 4:  # batches 1-2 (2 fetches per drained batch)
            return float("nan")
        return real_fetch(x)

    monkeypatch.setattr(loop_mod, "_fetch", fake_fetch)
    cfg = TrainConfig(
        model="DPOT", train_paths=["nan0"], res=16, patch_size=4, width=32,
        n_layers=1, n_blocks=4, modes=4, T_in=6, batch_size=8, epochs=1,
        num_workers=2, lr=1e-3, opt="adam", use_writer=True,
        rollback_factor=2.0, rollback_warmup_steps=5,
        rollback_snapshot_steps=2,
    )
    train(cfg, log_dir=str(tmp_path / "run"))
    logs = (tmp_path / "run" / "logs.txt").read_text()
    # the forged-NaN batches each triggered a restore (no EMA needed)
    assert logs.count("restoring previous good state") == 2


def test_empty_eval_loader_reports_nan_not_zero(tmp_path, monkeypatch):
    """A test DataLoader that yields no batches (sharded loader skipped a
    non-divisible set) must report NaN + a log line — not a perfect 0.0
    computed from an empty sum and a stale train-loop `y`."""
    import dpot_tpu.train.loop as loop_mod
    from dpot_tpu.data.registry import make_synthetic_spec

    make_synthetic_spec(
        "emptyev", train_size=16, test_size=8, t_total=12, t_test=2,
        in_size=(16, 16), n_channels=1,
    )

    real_loader = loop_mod.DataLoader

    class MaybeEmptyLoader:
        """Delegates to the real loader; eval loaders (shuffle=False)
        yield nothing, simulating the sharded skip-all case."""

        def __init__(self, ds, batch_size, shuffle=False, **kw):
            self._dl = real_loader(ds, batch_size, shuffle=shuffle, **kw)
            self._empty = not shuffle

        def __len__(self):
            return 0 if self._empty else len(self._dl)

        def __iter__(self):
            return iter(()) if self._empty else iter(self._dl)

        def __getattr__(self, k):
            return getattr(self._dl, k)

    monkeypatch.setattr(loop_mod, "DataLoader", MaybeEmptyLoader)
    cfg = TrainConfig(
        model="DPOT", train_paths=["emptyev"], res=16, patch_size=4,
        width=32, n_layers=1, n_blocks=4, modes=4, T_in=6, batch_size=8,
        epochs=1, num_workers=2, lr=1e-3, opt="adam", use_writer=True,
    )
    out = train(cfg, log_dir=str(tmp_path / "run"))
    logs = (tmp_path / "run" / "logs.txt").read_text()
    assert "produced no batches" in logs
    assert np.isnan(out["test_l2_steps"][0]) and np.isnan(out["test_l2_fulls"][0])


def test_host_fetch_rank0_and_passthrough():
    """utils.profiling.host_fetch: rank-0 device scalars travel via the
    (1,1)-reshape workaround, numpy/python leaves pass through untouched
    (no H2D round-trip), arrays come back as numpy with equal values."""
    from dpot_tpu.utils.profiling import host_fetch

    arr = np.arange(6.0).reshape(2, 3)
    tree = {
        "dev_scalar": jnp.asarray(3, jnp.int32),
        "dev_arr": jnp.ones((2, 2)),
        "np_arr": arr,
        "py_int": 7,
    }
    out = host_fetch(tree)
    assert out["np_arr"] is arr  # pass-through, not copied
    assert out["py_int"] == 7
    assert isinstance(out["dev_scalar"], np.ndarray) and out["dev_scalar"].ndim == 0
    assert int(out["dev_scalar"]) == 3
    np.testing.assert_array_equal(out["dev_arr"], np.ones((2, 2)))


def test_npz_fallback_params_slicing(tmp_path, monkeypatch):
    """The no-orbax npz fallback: dict flattening is KEY-SORTED, so params
    leaves sit AFTER opt_state's — restore_params must slice by the saved
    section counts (it previously took flat[:n_params], i.e. opt_state)."""
    import dpot_tpu.train.checkpoint as ck

    monkeypatch.setattr(ck, "_HAS_ORBAX", False)
    model, state = small_state()
    # make params distinguishable from the (zero) Adam moments
    params = jax.tree.map(lambda p: p + 1.5, state.params)
    state = state.replace(params=params)
    ck.save_checkpoint(str(tmp_path / "npz"), state)

    got = ck.restore_params(str(tmp_path / "npz"), state.params)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    _, fresh = small_state(seed=3)
    restored = ck.restore_checkpoint(str(tmp_path / "npz"), fresh)
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_steps_per_dispatch_matches_sequential(tmp_path):
    """--steps_per_dispatch 2 must reproduce the K=1 loss trajectory
    step-for-step: same sample grouping (loader permutation chunking
    aligns), same rng stream (threaded through the scanned carry), tail
    batches split back into B-sized single steps. train_size=40, B=8,
    K=2 -> two fused dispatches + one tail step per epoch (5 optimizer
    steps, identical to K=1)."""
    import json

    from dpot_tpu.data.registry import make_synthetic_spec

    make_synthetic_spec(
        "fuse2", train_size=40, test_size=8, t_total=12, t_test=2,
        in_size=(16, 16), n_channels=1,
    )
    base = dict(
        model="DPOT", train_paths=["fuse2"], res=16, patch_size=4, width=32,
        n_layers=1, n_blocks=4, modes=4, T_in=6, batch_size=8, epochs=2,
        num_workers=2, lr=1e-3, opt="adam", lr_method="cycle",
        noise_scale=0.05, rollback_factor=0.0, use_writer=True, seed=11,
    )

    def losses(d):
        out = []
        with open(d / "metrics.jsonl") as f:
            for line in f:
                r = json.loads(line)
                if r["tag"] == "train_loss_step":
                    out.append((r.get("step"), r["value"]))
        return out

    o1 = train(TrainConfig(**base), log_dir=str(tmp_path / "k1"))
    o2 = train(
        TrainConfig(steps_per_dispatch=2, **base),
        log_dir=str(tmp_path / "k2"),
    )
    l1, l2 = losses(tmp_path / "k1"), losses(tmp_path / "k2")
    assert len(l1) == len(l2) == 10  # 5 optimizer steps/epoch x 2
    np.testing.assert_allclose(
        [v for _, v in l2], [v for _, v in l1], rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        o2["test_l2_fulls"], o1["test_l2_fulls"], rtol=1e-4
    )
    assert int(jax.device_get(o1["state"].step)) == int(
        jax.device_get(o2["state"].step)
    ) == 10


def test_grad_accum_tail_fallback(tmp_path):
    """A trailing partial batch whose size doesn't divide grad_accum must
    fall back to the unaccumulated step, not crash (train_size=19, B=8,
    accum=4 -> tail of 3)."""
    from dpot_tpu.data.registry import make_synthetic_spec

    make_synthetic_spec(
        "ga_tail", train_size=19, test_size=8, t_total=12, t_test=2,
        in_size=(16, 16), n_channels=1,
    )
    cfg = TrainConfig(
        model="DPOT", train_paths=["ga_tail"], res=16, patch_size=4,
        width=32, n_layers=1, n_blocks=4, modes=4, T_in=6, batch_size=8,
        grad_accum=4, epochs=1, num_workers=2, lr=1e-3, opt="adam",
        use_writer=True,
    )
    out = train(cfg, log_dir=str(tmp_path / "run"))
    assert np.isfinite(out["train_l2_step"])
    assert int(jax.device_get(out["state"].step)) == 3  # ceil(19/8)


def test_config_validation_rejects_bad_knobs():
    import pytest

    with pytest.raises(AssertionError, match="opt_moment_dtype"):
        TrainConfig(opt_moment_dtype="bf16")
    with pytest.raises(AssertionError, match="grad_accum"):
        TrainConfig(batch_size=8, grad_accum=3)
    with pytest.raises(AssertionError, match="steps_per_dispatch"):
        TrainConfig(steps_per_dispatch=0)


def test_grad_accum_composes_with_steps_per_dispatch(tmp_path):
    """All three batch-shaping levers at once — grad_accum microbatching
    INSIDE each of K fused dispatch steps, with an odd tail (38 = 2*16+6)
    that falls back through both levers — must train finite and take
    exactly ceil(38/8)=5 optimizer steps/epoch."""
    from dpot_tpu.data.registry import make_synthetic_spec

    make_synthetic_spec(
        "fuse_ga", train_size=38, test_size=8, t_total=12, t_test=2,
        in_size=(16, 16), n_channels=1,
    )
    cfg = TrainConfig(
        model="DPOT", train_paths=["fuse_ga"], res=16, patch_size=4,
        width=32, n_layers=1, n_blocks=4, modes=4, T_in=6, batch_size=8,
        grad_accum=2, steps_per_dispatch=2, epochs=1, num_workers=2,
        lr=1e-3, opt="adam", use_writer=True,
    )
    out = train(cfg, log_dir=str(tmp_path / "run"))
    assert np.isfinite(out["train_l2_step"])
    assert int(jax.device_get(out["state"].step)) == 5
