"""End-to-end CLI round trips: train -> checkpoint -> evaluate, and
torch .pth -> evaluate / convert (the full interop user journey)."""

import os

import numpy as np
import pytest
import jax

from dpot_tpu.data.registry import make_synthetic_spec


@pytest.fixture(scope="module", autouse=True)
def specs():
    make_synthetic_spec("synth_rt", train_size=8, test_size=4,
                        t_total=12, t_test=3, in_size=(16, 16), n_channels=2)


MODEL_ARGS = (
    "--res 16 --patch_size 4 --width 32 --n_layers 1 --n_blocks 4 --modes 4 "
    "--T_in 6 --batch_size 4 --num_workers 2"
)


def test_train_then_evaluate_cli(tmp_path):
    from dpot_tpu.cli.evaluate import main as eval_main
    from dpot_tpu.cli.train import main as train_main

    out = train_main(
        (
            f"--model DPOT --train_paths synth_rt {MODEL_ARGS} --epochs 1 "
            f"--lr 1e-3 --use_writer true --log_path {tmp_path}"
        ).split()
    )
    runs = [d for d in os.listdir(tmp_path)]
    assert runs, "no run dir written"
    ckpt = os.path.join(tmp_path, runs[0], "model")
    assert os.path.exists(ckpt)

    results = eval_main(
        (
            f"--model DPOT --train_paths synth_rt --test_paths synth_rt "
            f"{MODEL_ARGS} --resume_path {ckpt}"
        ).split()
    )
    assert np.isfinite(results["synth_rt"]["loss_full"])


def make_reference_style_pth(path):
    """Build a reference-format checkpoint ({'args','model','optimizer'})
    from the actual reference DPOTNet, mirroring train_temporal.py:287."""
    import importlib.util

    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_dpot_rt", "/root/reference/models/dpot.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(0)
    tmodel = mod.DPOTNet(
        img_size=16, patch_size=4, in_channels=2, out_channels=2,
        in_timesteps=6, out_timesteps=1, n_blocks=4, embed_dim=32,
        out_layer_dim=32, depth=1, modes=4, n_cls=1,
    )
    torch.save({"args": {}, "model": tmodel.state_dict(), "optimizer": {}}, path)
    return tmodel


@pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference mount unavailable"
)
def test_evaluate_cli_with_torch_pth(tmp_path):
    from dpot_tpu.cli.evaluate import main as eval_main

    pth = str(tmp_path / "ref.pth")
    make_reference_style_pth(pth)
    results = eval_main(
        (
            f"--model DPOT --train_paths synth_rt --test_paths synth_rt "
            f"{MODEL_ARGS} --resume_path {pth}"
        ).split()
    )
    assert np.isfinite(results["synth_rt"]["loss_full"])


@pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference mount unavailable"
)
def test_convert_cli(tmp_path):
    from dpot_tpu.cli.convert import main as convert_main

    pth = str(tmp_path / "ref.pth")
    make_reference_style_pth(pth)
    out = str(tmp_path / "native_ckpt")
    convert_main(
        (
            f"--model DPOT --train_paths synth_rt {MODEL_ARGS} "
            f"--resume_path {pth} --out_path {out}"
        ).split()
    )
    assert os.path.exists(os.path.join(out, "state"))
    # converted checkpoint loads through the native path
    from dpot_tpu.cli.evaluate import main as eval_main

    results = eval_main(
        (
            f"--model DPOT --train_paths synth_rt --test_paths synth_rt "
            f"{MODEL_ARGS} --resume_path {out}"
        ).split()
    )
    assert np.isfinite(results["synth_rt"]["loss_full"])


@pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference mount unavailable"
)
def test_convert_cli_fno(tmp_path):
    """Converter dispatch for non-DPOT families: reference FNO2d .pth ->
    native checkpoint -> evaluate."""
    import importlib.util

    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_fno_cli", "/root/reference/models/fno.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(0)
    # FNO runs patch_size=1 for AR rollout (patch>1 outputs at latent
    # resolution — the reference convention, see test_models_families)
    tmodel = mod.FNO2d(
        modes1=4, modes2=4, width=32, img_size=16, n_channels=2,
        in_timesteps=6, out_timesteps=1, n_layers=1, patch_size=1, n_cls=1,
    )
    pth = str(tmp_path / "fno.pth")
    torch.save({"model": tmodel.state_dict()}, pth)

    from dpot_tpu.cli.convert import main as convert_main
    from dpot_tpu.cli.evaluate import main as eval_main

    fno_args = MODEL_ARGS.replace("--patch_size 4", "--patch_size 1")
    out = str(tmp_path / "fno_native")
    convert_main(
        (
            f"--model FNO --train_paths synth_rt {fno_args} "
            f"--resume_path {pth} --out_path {out}"
        ).split()
    )
    assert os.path.exists(os.path.join(out, "state"))
    results = eval_main(
        (
            f"--model FNO --train_paths synth_rt --test_paths synth_rt "
            f"{fno_args} --resume_path {out}"
        ).split()
    )
    assert np.isfinite(results["synth_rt"]["loss_full"])


def test_config_from_ckpt_adopts_architecture(tmp_path):
    """--config_from_ckpt true: eval adopts the checkpoint's saved model
    architecture (act/width/patch_size...) from params.json, so a
    non-default activation can't be silently mis-served by forgetting to
    re-type the flag (the act class of mismatch is invisible to
    restore_params)."""
    import json

    from dpot_tpu.data.registry import make_synthetic_spec
    from dpot_tpu.utils.config import ckpt_config_base, load_config

    make_synthetic_spec(
        "cfgck", train_size=16, test_size=8, t_total=12, t_test=2,
        in_size=(16, 16), n_channels=1,
    )
    from dpot_tpu.train.loop import train
    from dpot_tpu.utils.config import TrainConfig

    cfg = TrainConfig(
        model="DPOT", train_paths=["cfgck"], res=16, patch_size=4, width=32,
        n_layers=1, n_blocks=4, modes=4, T_in=6, act="tanh", epochs=1,
        batch_size=8, num_workers=2, lr=1e-3, opt="adam", use_writer=True,
    )
    train(cfg, log_dir=str(tmp_path / "run"))
    ck = str(tmp_path / "run" / "model")

    base = ckpt_config_base(ck)
    assert base["act"] == "tanh" and base["width"] == 32
    assert "lr" not in base and "train_paths" not in base  # arch only

    got = load_config(
        ["--config_from_ckpt", "true", "--resume_path", ck,
         "--test_paths", "cfgck"]
    )
    assert got.act == "tanh" and got.width == 32 and got.patch_size == 4
    assert got.T_in == 6 and got.modes == 4 and got.n_layers == 1
    # flags still override the adopted base
    got2 = load_config(
        ["--config_from_ckpt", "true", "--resume_path", ck, "--act", "gelu"]
    )
    assert got2.act == "gelu"
