"""End-to-end train/eval step tests: loss decreases on a tiny overfit task,
rollout shapes, and data-parallel equivalence on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dpot_tpu.models.dpot import DPOTNet
from dpot_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from dpot_tpu.train.optimizers import build_optimizer
from dpot_tpu.train.schedules import build_schedule
from dpot_tpu.train.state import TrainState
from dpot_tpu.train.step import make_eval_rollout, make_train_step


def tiny_model_and_batch(B=4, T_ar=2):
    model = DPOTNet(
        img_size=16, patch_size=4, in_channels=2, out_channels=2,
        in_timesteps=4, out_timesteps=1, embed_dim=32, depth=2, n_blocks=4,
        modes=8, n_cls=3,
    )
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, 16, 16, 4, 2)).astype(np.float32)
    # learnable target: persistence of the last input frame
    y = np.tile(x[..., -1:, :], (1, 1, 1, T_ar, 1))
    batch = {
        "x": jnp.asarray(x),
        "y": jnp.asarray(y),
        "msk": jnp.ones((B, 16, 16, 1, 2), jnp.float32),
        "cls": jnp.zeros((B,), jnp.int32),
    }
    params = model.init(jax.random.key(0), batch["x"])
    return model, params, batch


def test_train_step_decreases_loss():
    model, params, batch = tiny_model_and_batch()
    tx = build_optimizer("adam", 1e-2, grad_clip=1.0)
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=tx, rng=jax.random.key(1)
    )
    step = make_train_step(t_bundle=1, noise_scale=0.0, donate=False)
    losses = []
    for _ in range(60):
        state, aux = step(state, batch)
        losses.append(float(aux["loss_step"]))
    assert losses[-1] < losses[0] * 0.5, losses[::10]
    assert int(state.step) == 60


def test_train_step_noise_injection_runs():
    model, params, batch = tiny_model_and_batch(T_ar=1)
    tx = build_optimizer("lamb", build_schedule("cycle", 1e-3, 10, 10, 1))
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=tx, rng=jax.random.key(2)
    )
    step = make_train_step(t_bundle=1, noise_scale=5e-4, donate=False)
    state, aux = step(state, batch)
    assert np.isfinite(float(aux["loss_step"]))
    assert np.isfinite(float(aux["grad_norm"]))


def test_ones_mask_elision_is_exact():
    """make_train_step(ones_mask=True) with NO msk in the batch produces
    the identical loss/update as the masked step over all-ones masks (the
    wire-format optimization must be a pure transfer saving)."""
    model, params, batch = tiny_model_and_batch()
    tx = build_optimizer("adam", 1e-3, grad_clip=1.0)

    def run(step, b):
        state = TrainState.create(model.apply, params, tx, jax.random.key(1))
        state, aux = step(state, b)
        return float(aux["loss_step"]), state

    l_m, s_m = run(make_train_step(t_bundle=1, noise_scale=0.0, donate=False), batch)
    b2 = {k: v for k, v in batch.items() if k != "msk"}
    l_o, s_o = run(
        make_train_step(t_bundle=1, noise_scale=0.0, donate=False,
                        ones_mask=True),
        b2,
    )
    assert l_m == l_o
    # the two steps are mathematically identical but compile to different
    # HLO (mask multiply fused vs absent) — reductions may round in a
    # different order, and adam's mhat/sqrt(vhat) normalization amplifies
    # that ulp noise on near-zero gradients; compare updates to 1e-4
    # relative (vs lr=1e-3-scale updates), not bits
    for a, b in zip(jax.tree.leaves(s_m.params), jax.tree.leaves(s_o.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_eval_rollout_shapes():
    model, params, batch = tiny_model_and_batch(T_ar=5)
    roll = make_eval_rollout(t_bundle=1)
    out = roll(model.apply, params, batch)
    assert out["pred"].shape == batch["y"].shape
    assert np.isfinite(float(out["loss_full"]))
    # rollout step loss >= full loss is not guaranteed, but both finite
    assert np.isfinite(float(out["loss_step"]))


@pytest.mark.multichip
def test_data_parallel_matches_single_device():
    """The DP train step over an 8-device mesh must produce the same params
    as the single-device step (gradient psum correctness)."""
    model, params, batch = tiny_model_and_batch(B=8, T_ar=1)
    tx = build_optimizer("adam", 1e-3, grad_clip=1.0)

    # single device
    s1 = TrainState.create(model.apply, params, tx, jax.random.key(3))
    step = make_train_step(t_bundle=1, noise_scale=0.0, donate=False)
    s1, aux1 = step(s1, batch)

    # 8-device data parallel
    mesh = make_mesh(data=8, spatial=1)
    sharded = shard_batch(batch, mesh)
    s2 = TrainState.create(model.apply, params, tx, jax.random.key(3))
    s2 = replicate(s2, mesh)
    s2, aux2 = step(s2, sharded)

    np.testing.assert_allclose(
        float(aux1["loss_step"]), float(aux2["loss_step"]), rtol=1e-5
    )
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(jax.device_get(s2.params))
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_eval_rollout_trims_non_divisible_t_bundle():
    """t_test % t_bundle != 0: the scan rollout over-predicts to the next
    bundle boundary and must trim back to exactly t_test frames
    (evaluate.py:183-216 semantics)."""
    from dpot_tpu.models import build_model
    from dpot_tpu.train.step import make_eval_rollout

    model = build_model(
        "DPOT", img_size=16, patch_size=4, in_channels=1, in_timesteps=4,
        out_timesteps=2, embed_dim=32, depth=1, n_blocks=4, modes=4, n_cls=1,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4, 1)), jnp.float32)
    params = model.init(jax.random.key(0), x)
    t_test = 5  # 3 bundles of 2 -> 6 predicted, trimmed to 5
    roll = make_eval_rollout(t_bundle=2)
    out = roll(
        model.apply, params,
        {
            "x": x,
            "y": jnp.zeros((2, 16, 16, t_test, 1), jnp.float32),
            "msk": jnp.ones((2, 16, 16, 1, 1), jnp.float32),
        },
    )
    assert out["pred"].shape == (2, 16, 16, t_test, 1)
    assert np.isfinite(float(jnp.reshape(out["loss_full"], (1, 1))[0, 0]))


def test_wrong_resolution_raises_with_both_sizes():
    """Feeding a 32^2 batch to a 16^2 model must fail with an assert that
    names both sizes (models/dpot.py img_size check)."""
    from dpot_tpu.models import build_model

    model = build_model(
        "DPOT", img_size=16, patch_size=4, in_channels=1, in_timesteps=4,
        out_timesteps=1, embed_dim=32, depth=1, n_blocks=4, modes=4, n_cls=1,
    )
    with pytest.raises(AssertionError, match="32x32.*16"):
        model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 4, 1)))


def test_rel_lp_loss_zero_target_guard():
    """All-zero targets must not produce inf/nan (1e-8 guard in rel-L2,
    reference criterion.py:56)."""
    from dpot_tpu.utils.criterion import rel_lp_loss

    pred = jnp.ones((2, 8, 8, 1, 2))
    y = jnp.zeros((2, 8, 8, 1, 2))
    msk = jnp.ones((2, 8, 8, 1, 2))
    v = float(jnp.reshape(rel_lp_loss(pred, y, msk), (1, 1))[0, 0])
    assert np.isfinite(v)


def test_grad_accum_matches_full_batch():
    """grad_accum=N is an execution schedule, not an approximation: the
    summed microbatch gradients equal the full-batch gradient (losses are
    batch sums), so the post-step params/opt state/metrics match the
    full-batch step to reduction-order tolerance."""
    model, params, batch = tiny_model_and_batch(B=8, T_ar=2)
    tx = build_optimizer("adam", 1e-3, grad_clip=1.0)

    def run(ga, n_steps=3):
        state = TrainState.create(
            apply_fn=model.apply, params=params, tx=tx, rng=jax.random.key(1)
        )
        step = make_train_step(t_bundle=1, donate=False, grad_accum=ga)
        for _ in range(n_steps):
            state, aux = step(state, batch)
        return state, aux

    s1, a1 = run(1)
    s4, a4 = run(4)
    np.testing.assert_allclose(
        float(a1["loss_step"]), float(a4["loss_step"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(a1["loss_full"]), float(a4["loss_full"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(a1["cls_loss"]), float(a4["cls_loss"]), rtol=1e-5
    )
    assert float(a1["cls_correct"]) == float(a4["cls_correct"])
    assert float(a1["n_steps"]) == float(a4["n_steps"]) == 2.0
    for p1, p4 in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s4.params)):
        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p4), rtol=2e-4, atol=2e-6
        )
    assert int(s1.step) == int(s4.step) == 3


def test_grad_accum_batch_stats_thread():
    """grad_accum threads UNet's BatchNorm running stats microbatch ->
    microbatch (each sees the previous one's update, like N sequential
    forward passes), and the returned stats differ from the originals."""
    from dpot_tpu.models import build_model

    model = build_model(
        "UNet", img_size=16, patch_size=4, in_channels=2, out_channels=2,
        in_timesteps=4, out_timesteps=1, modes=4, n_cls=2, embed_dim=32,
        depth=1, n_blocks=4, out_layer_dim=8,
    )
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 16, 16, 4, 2)).astype(np.float32)
    y = x[..., -1:, :]
    batch = {
        "x": jnp.asarray(x), "y": jnp.asarray(y),
        "msk": jnp.ones((8, 16, 16, 1, 2), jnp.float32),
        "cls": jnp.zeros((8,), jnp.int32),
    }
    params = model.init(jax.random.key(0), batch["x"])
    assert "batch_stats" in params
    tx = build_optimizer("adam", 1e-3, grad_clip=1.0)
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=tx, rng=jax.random.key(1),
    )
    step = make_train_step(t_bundle=1, donate=False, grad_accum=2)
    new_state, aux = step(state, batch)
    assert np.isfinite(float(aux["loss_step"]))
    before = jax.tree.leaves(params["batch_stats"])
    after = jax.tree.leaves(new_state.params["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )


@pytest.mark.multichip
def test_grad_accum_composes_with_data_parallel():
    """grad_accum under DP: the microbatch reshape splits the (sharded)
    leading axis, so each device scans over its own microbatch slices; the
    summed-gradient psum must still equal the single-device full-batch
    step."""
    model, params, batch = tiny_model_and_batch(B=16, T_ar=1)
    tx = build_optimizer("adam", 1e-3, grad_clip=1.0)

    s1 = TrainState.create(model.apply, params, tx, jax.random.key(3))
    step_full = make_train_step(t_bundle=1, noise_scale=0.0, donate=False)
    s1, aux1 = step_full(s1, batch)

    mesh = make_mesh(data=8, spatial=1)
    sharded = shard_batch(batch, mesh)
    s2 = TrainState.create(model.apply, params, tx, jax.random.key(3))
    s2 = replicate(s2, mesh)
    step_ga = make_train_step(
        t_bundle=1, noise_scale=0.0, donate=False, grad_accum=2
    )
    s2, aux2 = step_ga(s2, sharded)

    np.testing.assert_allclose(
        float(aux1["loss_step"]), float(aux2["loss_step"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(s1.params),
        jax.tree.leaves(jax.device_get(s2.params)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_scan_steps_matches_sequential():
    """make_train_step(scan_steps=K) over K stacked batches must reproduce
    K sequential single-step calls exactly (same ops, rng threaded through
    the carried state) — incl. per-step aux, stacked (K,)."""
    model, params, batch = tiny_model_and_batch(B=4, T_ar=1)
    tx = build_optimizer("adam", 1e-3, grad_clip=1.0)
    K = 3
    rng = np.random.default_rng(1)
    batches = [
        {
            "x": jnp.asarray(rng.standard_normal(batch["x"].shape), jnp.float32),
            "y": jnp.asarray(rng.standard_normal(batch["y"].shape), jnp.float32),
            "msk": batch["msk"],
            "cls": batch["cls"],
        }
        for _ in range(K)
    ]

    s_seq = TrainState.create(model.apply, params, tx, jax.random.key(7))
    step1 = make_train_step(t_bundle=1, noise_scale=1e-3, donate=False)
    seq_aux = []
    for b in batches:
        s_seq, aux = step1(s_seq, b)
        seq_aux.append(float(aux["loss_step"]))

    s_scan = TrainState.create(model.apply, params, tx, jax.random.key(7))
    stepK = make_train_step(
        t_bundle=1, noise_scale=1e-3, donate=False, scan_steps=K
    )
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    s_scan, auxK = stepK(s_scan, stacked)

    assert auxK["loss_step"].shape == (K,)
    np.testing.assert_allclose(
        np.asarray(auxK["loss_step"]), seq_aux, rtol=1e-6
    )
    assert int(s_scan.step) == int(s_seq.step) == K
    for a, b in zip(
        jax.tree.leaves(s_seq.params), jax.tree.leaves(s_scan.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        )
    # the rng stream advanced identically (next draws match)
    k1 = jax.random.normal(jax.random.split(s_seq.rng)[1], (3,))
    k2 = jax.random.normal(jax.random.split(s_scan.rng)[1], (3,))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
