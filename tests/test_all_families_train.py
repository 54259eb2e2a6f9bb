"""Every model family must run through the real jitted train step (one
gradient step + finite loss), not just forward."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dpot_tpu.models import build_model
from dpot_tpu.train.optimizers import build_optimizer
from dpot_tpu.train.state import TrainState
from dpot_tpu.train.step import make_train_step, wrap_pred_only


COMMON = dict(img_size=16, patch_size=4, in_channels=2, out_channels=2,
              in_timesteps=4, out_timesteps=1, modes=4, n_cls=2,
              embed_dim=32, depth=1, n_blocks=4, out_layer_dim=8)


@pytest.mark.parametrize(
    "family",
    ["DPOT", "CDPOT", "FNO", pytest.param("UNet", marks=pytest.mark.slow)],
)
def test_family_train_step_2d(family):
    kwargs = dict(COMMON)
    if family == "FNO":
        # FNO predicts at latent resolution, so it trains with patch_size=1
        # (the reference's classic-FNO configuration); modes <= H//2
        kwargs["patch_size"] = 1
    model = build_model(family, **kwargs)
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.standard_normal((2, 16, 16, 4, 2)), jnp.float32),
        "y": jnp.asarray(rng.standard_normal((2, 16, 16, 1, 2)), jnp.float32),
        "msk": jnp.ones((2, 16, 16, 1, 2), jnp.float32),
        "cls": jnp.zeros((2,), jnp.int32),
    }
    params = model.init(jax.random.key(0), batch["x"])
    tx = build_optimizer("adam", 1e-3, grad_clip=1.0)
    state = TrainState.create(model.apply, params, tx, jax.random.key(1))
    step = make_train_step(t_bundle=1, noise_scale=1e-4, donate=False)
    state2, aux = step(state, batch)
    assert np.isfinite(float(jnp.reshape(aux["loss_step"], ())))
    # params actually changed
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(state2.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("family", ["DPOT3D", "FNO3D"])
def test_family_train_step_3d(family):
    model = build_model(
        family, img_size=8, patch_size=2, in_channels=2, out_channels=2,
        in_timesteps=3, out_timesteps=1, modes=2, n_cls=1, embed_dim=16,
        depth=1, n_blocks=4, out_layer_dim=8,
        **({"temporal_modes": 2} if family == "DPOT3D" else {}),
    )
    rng = np.random.default_rng(1)
    batch = {
        "x": jnp.asarray(rng.standard_normal((2, 8, 8, 8, 3, 2)), jnp.float32),
        "y": jnp.asarray(rng.standard_normal((2, 8, 8, 8, 1, 2)), jnp.float32),
        "msk": jnp.ones((2, 8, 8, 8, 1, 2), jnp.float32),
        "cls": jnp.zeros((2,), jnp.int32),
    }
    params = model.init(jax.random.key(0), batch["x"])
    apply = wrap_pred_only(model.apply)
    tx = build_optimizer("adam", 1e-3, grad_clip=1.0)
    state = TrainState.create(apply, params, tx, jax.random.key(1))
    step = make_train_step(t_bundle=1, noise_scale=0.0, donate=False)
    state2, aux = step(state, batch)
    assert np.isfinite(float(jnp.reshape(aux["loss_step"], ())))
