"""2D fine-tuning CLI — reference finetune.py equivalent.

Loads selected components from a pretrained checkpoint
(--load_components, default blocks/pos/time_agg, finetune.py:103,143) and
trains on the target dataset(s). --resume_path accepts a dpot_tpu
checkpoint dir or a reference/HF .pth.
"""

from __future__ import annotations

import sys


def main(argv=None):
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp

    from dpot_tpu.train.checkpoint import load_components
    from dpot_tpu.train.loop import build_everything, train
    from dpot_tpu.utils.config import load_config

    cfg = load_config(argv)
    print("config", vars(cfg))

    if not cfg.resume_path:
        return train(cfg)

    # build a throwaway state to get the target param template
    model, state, *_ = build_everything(cfg)

    if cfg.resume_path.endswith((".pth", ".pt")):
        from dpot_tpu.train.interop import (
            dpot_params_from_torch,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(cfg.resume_path)
        src = jax.tree.map(
            jnp.asarray,
            dpot_params_from_torch(
                sd, depth=cfg.n_layers, normalize=cfg.normalize,
                latent_size=(cfg.res // cfg.patch_size, cfg.res // cfg.patch_size),
            ),
        )
    else:
        from dpot_tpu.train.checkpoint import restore_params

        src = restore_params(cfg.resume_path, state.params)

    merged, copied = load_components(
        state.params, src, components=cfg.load_components
    )
    print(f"loaded components {cfg.load_components}: {len(copied)} subtrees")

    # hand the merged params straight to the loop (train() rebuilds its
    # own stack; clearing resume_path stops it re-restoring)
    cfg.resume_path = ""
    return train(cfg, init_params=merged)


if __name__ == "__main__":
    main()
