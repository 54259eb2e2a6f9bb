"""Checkpoint conversion CLI: reference/HF .pth -> dpot_tpu orbax.

    python -m dpot_tpu.cli.convert --resume_path model_Ti.pth \
        --model DPOT --width 512 --n_layers 4 --res 128 --out_path ckpt/Ti

Converts the released HuggingFace weights (reference README.md:28-31) into
a native checkpoint so every CLI (train --resume_path, evaluate, finetune)
can load it without torch in the loop.
"""

from __future__ import annotations

import sys


def main(argv=None):
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp

    from dpot_tpu.models import build_model
    from dpot_tpu.train.checkpoint import save_checkpoint
    from dpot_tpu.train import interop
    from dpot_tpu.train.interop import load_torch_checkpoint
    from dpot_tpu.train.optimizers import build_optimizer
    from dpot_tpu.train.state import TrainState
    from dpot_tpu.utils.config import load_config

    argv = list(argv if argv is not None else sys.argv[1:])
    out_path = "./converted_ckpt"
    if "--out_path" in argv:
        i = argv.index("--out_path")
        out_path = argv[i + 1]
        del argv[i : i + 2]
    cfg = load_config(argv)

    sd = load_torch_checkpoint(cfg.resume_path)
    n_channels = cfg.n_channels  # --n_channels (default 4)
    model = build_model(
        cfg.model, img_size=cfg.res, patch_size=cfg.patch_size,
        in_channels=n_channels, in_timesteps=cfg.T_in,
        out_timesteps=cfg.T_bundle, embed_dim=cfg.width, modes=cfg.modes,
        depth=cfg.n_layers, n_blocks=cfg.n_blocks, mlp_ratio=cfg.mlp_ratio,
        out_layer_dim=cfg.out_layer_dim, n_cls=len(cfg.train_paths),
        normalize=cfg.normalize,
    )
    # per-family converter dispatch (DPOT 2D/3D, CDPOT, FNO 2D/3D, UNet)
    name = cfg.model.upper()
    if name == "DPOT":
        conv = interop.dpot_params_from_torch(
            sd, depth=cfg.n_layers, normalize=cfg.normalize,
            latent_size=(cfg.res // cfg.patch_size, cfg.res // cfg.patch_size),
        )
    elif name == "DPOT3D":
        conv = interop.dpot3d_params_from_torch(
            sd, depth=cfg.n_layers, normalize=cfg.normalize
        )
    elif name == "CDPOT":
        conv = interop.cdpot_params_from_torch(
            sd, depth=cfg.n_layers, normalize=cfg.normalize
        )
    elif name == "FNO":
        conv = interop.fno2d_params_from_torch(
            sd, n_layers=cfg.n_layers, normalize=cfg.normalize,
            use_ln=bool(cfg.use_ln),
        )
    elif name == "FNO3D":
        conv = interop.fno3d_params_from_torch(
            sd, n_layers=cfg.n_layers, use_ln=bool(cfg.use_ln)
        )
    elif name == "UNET":
        conv = interop.unet_params_from_torch(sd)
    else:
        raise ValueError(f"no converter for model {cfg.model!r}")
    params = jax.tree.map(jnp.asarray, conv)
    tx = build_optimizer(cfg.opt, cfg.lr)
    state = TrainState.create(model.apply, params, tx, jax.random.key(0))
    save_checkpoint(out_path, state, config=vars(cfg))
    print(f"converted {cfg.resume_path} -> {out_path}")


if __name__ == "__main__":
    main()
