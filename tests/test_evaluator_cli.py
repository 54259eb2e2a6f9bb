"""Eval harness + finetune CLIs driven end-to-end on synthetic data."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dpot_tpu.data.registry import make_synthetic_spec
from dpot_tpu.models import build_model
from dpot_tpu.train.evaluator import (
    evaluate,
    evaluate_varying_resolution,
    refill_mask,
)


@pytest.fixture(scope="module")
def model_and_params():
    make_synthetic_spec("synth_eval", train_size=8, test_size=4,
                        t_total=12, t_test=4, in_size=(16, 16), n_channels=2)
    model = build_model(
        "DPOT", img_size=32, patch_size=4, in_channels=2, in_timesteps=6,
        out_timesteps=1, embed_dim=32, depth=1, n_blocks=4, modes=8, n_cls=1,
    )
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 6, 2)))
    return model, params


def test_evaluate_rollout(model_and_params):
    model, params = model_and_params
    res = evaluate(
        model, params, ["synth_eval"], res=32, t_in=6, batch_size=4,
        num_workers=2,
    )
    assert np.isfinite(res["synth_eval"]["loss_full"])
    assert res["avg_step_time"] > 0


def test_refill_mask():
    msk = np.zeros((2, 8, 8, 1, 3), np.float32)
    msk[:, ::2, ::2, :, :2] = 1.0
    out = np.asarray(refill_mask(jnp.asarray(msk), 16))
    assert out.shape == (2, 16, 16, 1, 3)
    assert (out[..., :2] == 1).all()
    assert (out[..., 2] == 0).all()


def test_evaluate_varying_resolution(model_and_params):
    model, params = model_and_params
    res = evaluate_varying_resolution(
        model, params, ["synth_eval"], model_res=32, t_in=6, batch_size=4,
        res_list=[16, 24], num_workers=2,
    )
    assert set(res.keys()) == {16, 24}
    for r in res.values():
        assert np.isfinite(r["synth_eval"]["loss_full"])


def test_finetune3d_cli_synthetic(tmp_path):
    make_synthetic_spec("synthetic_3d_ft", train_size=4, test_size=2,
                        t_total=8, t_test=2, in_size=(8, 8, 8), n_channels=2)
    from dpot_tpu.cli.finetune3d import main

    state = main(
        (
            "--train_paths synthetic_3d_ft --res 8 --patch_size 2 --width 16 "
            "--n_layers 1 --n_blocks 4 --modes 2 --T_in 4 --T_ar 1 --epochs 1 "
            "--batch_size 2 --num_workers 2 --lr 1e-3"
        ).split()
    )
    assert int(jax.device_get(state.step)) == 2  # 4 samples / batch 2
