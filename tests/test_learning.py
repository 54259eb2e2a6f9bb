"""Real learning test: a small DPOT must actually FIT a learnable PDE-like
task (synthetic smooth advection), not merely tick the loss downward.
This is the statistical-validation stand-in for the reference's
watch-the-curves workflow (SURVEY.md §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dpot_tpu.data import DataLoader, MixedTemporalDataset
from dpot_tpu.data.registry import make_synthetic_spec
from dpot_tpu.models import build_model
from dpot_tpu.train.optimizers import build_optimizer
from dpot_tpu.train.schedules import build_schedule
from dpot_tpu.train.state import TrainState
from dpot_tpu.train.step import make_eval_rollout, make_train_step


@pytest.mark.slow
def test_dpot_learns_synthetic_dynamics():
    make_synthetic_spec(
        "learn_ns", train_size=24, test_size=8, t_total=16, t_test=4,
        in_size=(32, 32), n_channels=1,
    )
    train_ds = MixedTemporalDataset(["learn_ns"], res=32, t_in=6, t_ar=1,
                                    train=True)
    test_ds = MixedTemporalDataset(["learn_ns"], res=32, t_in=6, t_ar=-1,
                                   n_channels=1, train=False)
    train_dl = DataLoader(train_ds, 8, shuffle=True, num_workers=2, seed=0)
    test_dl = DataLoader(test_ds, 8, shuffle=False, num_workers=2)

    model = build_model(
        "DPOT", img_size=32, patch_size=4, in_channels=1, in_timesteps=6,
        out_timesteps=1, embed_dim=64, depth=3, n_blocks=4, modes=8, n_cls=1,
    )
    params = model.init(jax.random.key(0), jnp.zeros((8, 32, 32, 6, 1)))
    epochs = 120
    sched = build_schedule("cycle", 2e-3, len(train_dl), epochs,
                           warmup_epochs=4)
    tx = build_optimizer("adam", sched, grad_clip=1.0)
    state = TrainState.create(model.apply, params, tx, jax.random.key(1))
    step = make_train_step(t_bundle=1, noise_scale=5e-4, donate=False)
    roll = make_eval_rollout(t_bundle=1)

    first = None
    for ep in range(epochs):
        tot = 0.0
        for x, y, msk, cls in train_dl:
            state, aux = step(
                state, {"x": jnp.asarray(x), "y": jnp.asarray(y),
                        "msk": jnp.asarray(msk), "cls": jnp.asarray(cls)}
            )
            tot += float(jnp.reshape(aux["loss_step"], ()))
        if first is None:
            first = tot / len(train_ds)
    train_rel = tot / len(train_ds)

    # held-out 4-step rollout
    ev = 0.0
    for x, y, msk, _ in test_dl:
        out = roll(model.apply, state.params,
                   {"x": jnp.asarray(x), "y": jnp.asarray(y),
                    "msk": jnp.asarray(msk)})
        ev += float(jnp.reshape(out["loss_full"], ()))
    test_rel = ev / len(test_ds)

    # the dynamics are deterministic & smooth: the model must fit well below
    # the trivial predict-zero baseline (rel-L2 = 1.0)
    assert train_rel < 0.3 * first, (first, train_rel)
    assert train_rel < 0.3, train_rel
    assert test_rel < 0.7, test_rel


def test_dpot_learning_smoke_default_suite():
    """Driver-visible (non-slow) proof that the full train step LEARNS:
    ~100 steps on a tiny synthetic task must cut the step loss by >40%
    (the full fit-to-tolerance test above stays slow-marked)."""
    make_synthetic_spec(
        "learn_smoke", train_size=16, test_size=4, t_total=12, t_test=4,
        in_size=(16, 16), n_channels=1,
    )
    ds = MixedTemporalDataset(["learn_smoke"], res=16, t_in=4, t_ar=1,
                              train=True)
    dl = DataLoader(ds, 8, shuffle=True, num_workers=0, seed=0)

    model = build_model(
        "DPOT", img_size=16, patch_size=4, in_channels=1, in_timesteps=4,
        out_timesteps=1, embed_dim=32, depth=2, n_blocks=4, modes=4, n_cls=1,
    )
    params = model.init(jax.random.key(0), jnp.zeros((8, 16, 16, 4, 1)))
    epochs = 50
    sched = build_schedule("cycle", 2e-3, len(dl), epochs, warmup_epochs=2)
    tx = build_optimizer("adam", sched, grad_clip=1.0)
    state = TrainState.create(model.apply, params, tx, jax.random.key(1))
    step = make_train_step(t_bundle=1, noise_scale=0.0, donate=False)

    first = last = None
    for ep in range(epochs):
        tot = 0.0
        for x, y, msk, cls in dl:
            state, aux = step(
                state, {"x": jnp.asarray(x), "y": jnp.asarray(y),
                        "msk": jnp.asarray(msk), "cls": jnp.asarray(cls)}
            )
            tot += float(jnp.reshape(aux["loss_step"], ()))
        if first is None:
            first = tot
        last = tot
    assert np.isfinite(last)
    assert last < 0.6 * first, (first, last)
