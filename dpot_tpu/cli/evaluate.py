"""Evaluation CLI — reference evaluate.py equivalent.

    python -m dpot_tpu.cli.evaluate --model DPOT --resume_path <ckpt> \
        --test_paths ns2d_fno_1e-5 --res 128 --width 1024 --n_layers 6

--resume_path accepts either a dpot_tpu orbax checkpoint directory or a
reference/HF .pth file (converted on the fly via the interop layer).
--varyres runs the resolution-transfer sweep (evaluate_varyingres.py).
"""

from __future__ import annotations

import sys


def load_params_any(resume_path: str, model, cfg, sample_shape):
    """Checkpoint path -> params, handling both native and torch formats.
    sample_shape's rank picks the 2D vs 3D torch converter."""
    import jax
    import jax.numpy as jnp

    if resume_path.endswith((".pth", ".pt")):
        from dpot_tpu.train.interop import (
            dpot3d_params_from_torch,
            dpot_params_from_torch,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(resume_path)
        if len(sample_shape) == 6:  # (1, X, Y, Z, T, C)
            converted = dpot3d_params_from_torch(
                sd, depth=cfg.n_layers, normalize=cfg.normalize
            )
        else:
            converted = dpot_params_from_torch(
                sd, depth=cfg.n_layers, normalize=cfg.normalize,
                latent_size=(cfg.res // cfg.patch_size, cfg.res // cfg.patch_size),
            )
        return jax.tree.map(jnp.asarray, converted)
    from dpot_tpu.train.checkpoint import restore_params

    params0 = model.init(jax.random.key(0), jnp.zeros(sample_shape))
    return restore_params(resume_path, params0)


def main(argv=None):
    sys.path.insert(0, ".")
    import json

    from dpot_tpu.models import build_model
    from dpot_tpu.train.evaluator import evaluate, evaluate_varying_resolution
    from dpot_tpu.utils.config import load_config
    from dpot_tpu.data.registry import get_spec

    argv = list(argv if argv is not None else sys.argv[1:])
    varyres = "--varyres" in argv
    if varyres:
        argv.remove("--varyres")
    full_metrics = "--metrics" in argv
    if full_metrics:
        argv.remove("--metrics")
    cfg = load_config(argv)

    n_channels = max(get_spec(p).n_channels for p in cfg.test_paths)
    ndims = {p: get_spec(p).ndim for p in cfg.test_paths}
    if len(set(ndims.values())) > 1:
        raise SystemExit(
            "mixed-rank test sets are unsupported (one model serves one "
            f"spatial rank): {ndims} — evaluate 2D and 3D sets separately"
        )
    ndim = get_spec(cfg.test_paths[0]).ndim
    if varyres and ndim != 2:
        raise SystemExit(
            "--varyres sweeps 2D resolutions only (spectral resize + "
            f"varyres rollout are 2D); test sets are {ndim}D — run the "
            "standard 3D evaluation instead"
        )
    import jax.numpy as jnp

    model_name = cfg.model
    if ndim == 3 and model_name in ("DPOT", "dpot", "AFNO", "afno"):
        model_name = "DPOT3D"  # 3D datasets need the 3D family
    # pred-only families return just the field (no cls head)
    pred_only = model_name in ("DPOT3D", "dpot3d", "FNO3D", "fno3d")
    model = build_model(
        model_name, img_size=cfg.res, patch_size=cfg.patch_size,
        in_channels=n_channels, in_timesteps=cfg.T_in,
        out_timesteps=cfg.T_bundle, embed_dim=cfg.width, modes=cfg.modes,
        depth=cfg.n_layers, n_blocks=cfg.n_blocks, mlp_ratio=cfg.mlp_ratio,
        out_layer_dim=cfg.out_layer_dim, act=cfg.act,
        n_cls=len(cfg.train_paths), normalize=cfg.normalize,
        use_ln=cfg.use_ln,
        dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32,
    )
    sample_shape = (1,) + (cfg.res,) * ndim + (cfg.T_in, n_channels)
    params = load_params_any(cfg.resume_path, model, cfg, sample_shape)

    if varyres:
        results = evaluate_varying_resolution(
            model, params, cfg.test_paths, model_res=cfg.res, t_in=cfg.T_in,
            t_bundle=cfg.T_bundle, batch_size=cfg.batch_size,
            n_channels=n_channels, num_workers=cfg.num_workers,
        )
        for res, per_ds in results.items():
            for p, v in per_ds.items():
                print(f"res {res}, {p}: {v['loss_full']:.5f}")
    else:
        results = evaluate(
            model, params, cfg.test_paths, res=cfg.res, t_in=cfg.T_in,
            t_bundle=cfg.T_bundle, batch_size=cfg.batch_size,
            n_channels=n_channels, num_workers=cfg.num_workers,
            full_metrics=full_metrics, pred_only=pred_only,
            viz_dir=cfg.viz_dir or None,
        )
        for p in cfg.test_paths:
            print(f"{p}: {results[p]['loss_full']:.5f}")
        print(f"Avg time : {results['avg_step_time']:.5f}")
    print(json.dumps({k: v for k, v in results.items()}, default=str))
    return results


if __name__ == "__main__":
    main()
