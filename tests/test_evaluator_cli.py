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
    # batch_size=2 -> two same-shape batches: the FIRST call per shape
    # jit-compiles and is excluded from avg_step_time (it would swamp the
    # latency ~1000x over the tunnel); the second is timed
    res = evaluate(
        model, params, ["synth_eval"], res=32, t_in=6, batch_size=2,
        num_workers=2,
    )
    assert np.isfinite(res["synth_eval"]["loss_full"])
    assert res["avg_step_time"] > 0
    # a single-batch eval has no steady-state call to time: reports 0.0,
    # never the compile time
    res1 = evaluate(
        model, params, ["synth_eval"], res=32, t_in=6, batch_size=4,
        num_workers=2,
    )
    assert res1["avg_step_time"] == 0.0


def test_evaluate_emits_viz(model_and_params, tmp_path):
    """evaluate(viz_dir=...) renders the first sample of each dataset
    (rollout PNG + GIF — the --viz_dir CLI hook, utils/viz.save_eval_viz)."""
    import os

    model, params = model_and_params
    res = evaluate(
        model, params, ["synth_eval"], res=32, t_in=6, batch_size=4,
        num_workers=2, viz_dir=str(tmp_path),
    )
    assert np.isfinite(res["synth_eval"]["loss_full"])
    files = os.listdir(tmp_path)
    assert any(f.endswith("_rollout.png") for f in files), files
    assert any(f.endswith("_rollout.gif") for f in files), files


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


def test_all_shipped_configs_expand(capsys):
    """Every YAML in configs/ must expand through the sweep runner's
    --dry_run (VERDICT r2 #6: the 4 reference recipes dpot_finetune /
    cdpot_parallel / ns2d_pretrain / afno_config_single are part of the
    user-facing surface)."""
    import glob
    import os

    from dpot_tpu.cli.sweep import main as sweep_main

    cfgs = sorted(glob.glob(os.path.join("configs", "*.yaml")))
    names = {os.path.basename(c) for c in cfgs}
    for required in (
        "dpot_finetune.yaml", "cdpot_parallel.yaml", "ns2d_pretrain.yaml",
        "afno_config_single.yaml", "pretrain_tiny.yaml",
    ):
        assert required in names, f"missing shipped config {required}"
    for c in cfgs:
        jobs = sweep_main(["--config_file", c, "--dry_run"])
        assert len(jobs) >= 1, c
        for j in jobs:
            assert "model" in j or "resume_path" in j, (c, j)


def test_finetune3d_resume_from_non128_checkpoint(tmp_path, capsys):
    """finetune3d derives the 2D restore template from the checkpoint's
    params.json (VERDICT r2 weak #4) — a 32^2 2-channel 2D pretrain must
    inflate, not silently mis-template against the 128^2/4-channel
    default."""
    from dpot_tpu.train.checkpoint import save_checkpoint
    from dpot_tpu.train.optimizers import build_optimizer
    from dpot_tpu.train.state import TrainState

    model2d = build_model(
        "DPOT", img_size=32, patch_size=4, in_channels=2, in_timesteps=4,
        out_timesteps=1, embed_dim=16, depth=1, n_blocks=4, modes=4, n_cls=1,
    )
    p2d = model2d.init(jax.random.key(5), jnp.zeros((1, 32, 32, 4, 2)))
    st = TrainState.create(
        model2d.apply, p2d, build_optimizer("adam", 1e-3), jax.random.key(0)
    )
    ck = str(tmp_path / "ck2d")
    save_checkpoint(
        ck, st,
        config=dict(res=32, patch_size=4, n_channels=2, T_in=4, width=16,
                    modes=4, n_layers=1, n_blocks=4, mlp_ratio=1,
                    out_layer_dim=32, normalize=False),
    )

    make_synthetic_spec("synthetic_3d_rs", train_size=4, test_size=2,
                        t_total=8, t_test=2, in_size=(8, 8, 8), n_channels=2)
    from dpot_tpu.cli.finetune3d import main

    state = main(
        (
            "--train_paths synthetic_3d_rs --res 8 --patch_size 2 --width 16 "
            "--n_layers 1 --n_blocks 4 --modes 2 --T_in 4 --T_ar 1 "
            "--epochs 1 --batch_size 2 --num_workers 2 --lr 1e-3 "
            f"--resume_path {ck}"
        ).split()
    )
    out = capsys.readouterr().out
    assert "inflated" in out
    n = int(out.split("inflated ")[1].split(" ")[0])
    assert n > 0
    assert int(jax.device_get(state.step)) == 2


def test_evaluate_cli_3d_metrics(tmp_path):
    """VERDICT r2 #7: `cli.evaluate --metrics` on a 3D dataset emits the 3D
    battery (nMAE/nMSE/nMXE + 3D boundary RMSE + 3D spectral bands)."""
    from dpot_tpu.cli.evaluate import main as eval_main
    from dpot_tpu.train.checkpoint import save_checkpoint
    from dpot_tpu.train.optimizers import build_optimizer
    from dpot_tpu.train.state import TrainState

    make_synthetic_spec("synthetic_3d_ev", train_size=4, test_size=2,
                        t_total=10, t_test=2, in_size=(16, 16, 16),
                        n_channels=2)
    model3d = build_model(
        "DPOT3D", img_size=16, patch_size=4, in_channels=2, in_timesteps=4,
        out_timesteps=1, embed_dim=16, depth=1, n_blocks=4, modes=2, n_cls=1,
    )
    p3d = model3d.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 4, 2)))
    st = TrainState.create(
        model3d.apply, p3d, build_optimizer("adam", 1e-3), jax.random.key(0)
    )
    ck = str(tmp_path / "ck3d")
    save_checkpoint(ck, st)

    results = eval_main(
        (
            "--model DPOT3D --test_paths synthetic_3d_ev --res 16 "
            "--patch_size 4 --width 16 --n_layers 1 --n_blocks 4 --modes 2 "
            "--T_in 4 --batch_size 2 --num_workers 2 --metrics "
            f"--resume_path {ck}"
        ).split()
    )
    r = results["synthetic_3d_ev"]
    for k in ("nmae", "nmse", "nmxe", "bdmse", "fmse_low", "fmse_mid"):
        assert k in r, k
        assert np.isfinite(r[k]), (k, r[k])
    assert np.isfinite(r["loss_full"])
