"""bf16 working-copy fast path (TrainState.params_lp, DPOT_BENCH_PDTYPE).

The lever keeps the f32 master params in the optimizer pass only; fwd/bwd
consume a bf16 copy and emit bf16 gradients (upcast inside the optimizers
for all accumulation arithmetic — train/optimizers.py _gacc/_abs_sq).
No reference analogue (torch AMP keeps an f32 master the same way); the
reference-exact default path (params_lp=None) is pinned by the rest of the
suite and by test_training_dynamics.py.
"""

import numpy as np
import jax
import jax.numpy as jnp

from dpot_tpu.models.dpot import DPOTNet
from dpot_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from dpot_tpu.train.optimizers import build_optimizer
from dpot_tpu.train.state import TrainState, cast_working_copy
from dpot_tpu.train.step import make_train_step


def tiny(B=4, T_ar=1, dtype=jnp.bfloat16):
    model = DPOTNet(
        img_size=16, patch_size=4, in_channels=2, out_channels=2,
        in_timesteps=4, out_timesteps=1, embed_dim=32, depth=2, n_blocks=4,
        modes=8, n_cls=3, dtype=dtype,
    )
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, 16, 16, 4, 2)).astype(np.float32)
    y = np.tile(x[..., -1:, :], (1, 1, 1, T_ar, 1))
    batch = {
        "x": jnp.asarray(x),
        "y": jnp.asarray(y),
        "msk": jnp.ones((B, 16, 16, 1, 2), jnp.float32),
        "cls": jnp.zeros((B,), jnp.int32),
    }
    params = model.init(jax.random.key(0), batch["x"])
    return model, params, batch


def make_state(model, params, lever: bool, opt: str = "lamb"):
    tx = build_optimizer(opt, 1e-2, grad_clip=1.0)
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=tx, rng=jax.random.key(1),
        param_working_dtype=jnp.bfloat16 if lever else None,
    )


def test_working_copy_stays_exact_cast_and_learns():
    model, params, batch = tiny()
    state = make_state(model, params, lever=True, opt="adam")
    step = make_train_step(t_bundle=1, noise_scale=0.0, donate=False)
    losses = []
    for _ in range(60):
        state, aux = step(state, batch)
        losses.append(float(aux["loss_step"]))
    # master stays f32, working copy stays the EXACT cast of the master
    for p, lp in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(state.params_lp)
    ):
        assert p.dtype == jnp.float32 and lp.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(p.astype(jnp.bfloat16), np.float32), np.asarray(lp, np.float32)
        )
    assert losses[-1] < losses[0] * 0.6, losses[::10]


def test_working_copy_tracks_f32_path():
    """The lever's trajectory deviates only by bf16 wgrad rounding: over a
    few steps the loss curve must stay close to the f32-master path (both
    runs use bf16 COMPUTE; the A/B isolates the working-copy storage)."""
    model, params, batch = tiny()
    step = make_train_step(t_bundle=1, noise_scale=0.0, donate=False)

    s_ref = make_state(model, params, lever=False)
    s_lp = make_state(model, params, lever=True)
    for i in range(10):
        s_ref, aux_ref = step(s_ref, batch)
        s_lp, aux_lp = step(s_lp, batch)
        a, b = float(aux_ref["loss_step"]), float(aux_lp["loss_step"])
        assert abs(a - b) / a < 0.05, (i, a, b)


def test_working_copy_grad_accum_matches_full_batch():
    model, params, batch = tiny(B=4)
    s1 = make_state(model, params, lever=True)
    s2 = make_state(model, params, lever=True)
    step_full = make_train_step(t_bundle=1, noise_scale=0.0, donate=False)
    step_acc = make_train_step(
        t_bundle=1, noise_scale=0.0, donate=False, grad_accum=2
    )
    for _ in range(3):
        s1, a1 = step_full(s1, batch)
        s2, a2 = step_acc(s2, batch)
    # bf16 microbatch gradients ADD in f32 carry; small drift tolerated
    np.testing.assert_allclose(
        float(a1["loss_step"]), float(a2["loss_step"]), rtol=2e-2
    )


def test_working_copy_checkpoint_roundtrip(tmp_path):
    model, params, batch = tiny()
    state = make_state(model, params, lever=True)
    step = make_train_step(t_bundle=1, noise_scale=0.0, donate=False)
    for _ in range(3):
        state, _ = step(state, batch)
    path = str(tmp_path / "ck")
    save_checkpoint(path, state)
    fresh = make_state(model, params, lever=True)
    restored = restore_checkpoint(path, fresh)
    assert int(restored.step) == 3
    # params_lp is DERIVED (never saved): restore must rebuild it from the
    # restored f32 master
    want = cast_working_copy(restored.params, jnp.bfloat16)
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(restored.params_lp)):
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)
        )
    # and training continues bit-identically to the uninterrupted run
    state, aux_c = step(state, batch)
    restored, aux_r = step(restored, batch)
    np.testing.assert_allclose(
        float(aux_c["loss_step"]), float(aux_r["loss_step"]), rtol=1e-6
    )
