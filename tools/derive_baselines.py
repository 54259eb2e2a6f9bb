"""Derive per-preset A100 baseline estimates (VERDICT r3 item 7).

Measures step FLOPs by XLA cost analysis of the f32 train step (the math
the reference runs, fwd+bwd+Lamb, T_ar=1) for every ladder preset at its
ladder batch size, then applies the BASELINE.md §"Derived A100 baseline
estimate" model: fp32 matmul throughput band 11.7-14.6 TFLOP/s sustained,
plus optimizer HBM traffic (7 f32 tensors of param size @ 1.6 TB/s), plus
permute/pointwise HBM and eager launch overhead scaled from the M anchor
by activation volume and kernel count (depth).

Runs on CPU (forced) with abstract args — nothing is executed and no
parameter buffers are allocated, so even DPOT-H lowers in seconds.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from dpot_tpu.models import build_model
    from dpot_tpu.models.registry import MODEL_PRESETS as PRESETS
    from dpot_tpu.train.optimizers import build_optimizer
    from dpot_tpu.train.schedules import build_schedule
    from dpot_tpu.train.state import TrainState, training_key
    from dpot_tpu.train.step import make_train_step

    # (preset, ladder batch)
    cases = [("Ti", 8), ("S", 8), ("M", 8), ("M", 16), ("L", 4), ("H", 1)]
    img = 128

    # M anchor overheads from BASELINE.md (ms, (lo, hi)):
    M_PERMUTE = (5.0, 10.0)
    M_LAUNCH = (5.0, 10.0)
    SUSTAINED = (11.7, 14.6)  # TFLOP/s fp32 on A100, BASELINE.md band
    HBM = 1.6e12  # B/s

    m_act_vol = 8 * 1024 * 12  # B * embed * depth (anchor)
    m_depth = 12

    for preset, batch in cases:
        model = build_model(
            "DPOT", preset=preset, img_size=img, patch_size=8,
            in_channels=4, in_timesteps=10, out_timesteps=1, modes=32,
            n_cls=12,
        )
        x_s = jax.ShapeDtypeStruct((batch, img, img, 10, 4), jnp.float32)
        b_s = {
            "x": x_s,
            "y": jax.ShapeDtypeStruct((batch, img, img, 1, 4), jnp.float32),
            "msk": jax.ShapeDtypeStruct((batch, img, img, 1, 4), jnp.float32),
            "cls": jax.ShapeDtypeStruct((batch,), jnp.int32),
        }
        params = jax.eval_shape(model.init, jax.random.key(0), x_s)
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        tx = build_optimizer(
            "lamb", build_schedule("cycle", 1e-3, 1000, 10, 1), grad_clip=1.0
        )
        state = jax.eval_shape(
            lambda p: TrainState.create(model.apply, p, tx, training_key(1)),
            params,
        )
        step = make_train_step(t_bundle=1, noise_scale=5e-4)
        lowered = jax.jit(step._fun if hasattr(step, "_fun") else step).lower(
            state, b_s
        )
        flops = lowered.compile().cost_analysis()["flops"]
        tflop = flops / 1e12

        pr = PRESETS[preset]
        depth, embed = pr["depth"], pr["embed_dim"]
        act_ratio = (batch * embed * depth) / m_act_vol
        depth_ratio = depth / m_depth

        opt_ms = n_params * 4 * 7 / HBM * 1e3
        lo_ms = (
            tflop / SUSTAINED[1] * 1e3 + opt_ms
            + M_PERMUTE[0] * act_ratio + M_LAUNCH[0] * depth_ratio
        )
        hi_ms = (
            tflop / SUSTAINED[0] * 1e3 + opt_ms
            + M_PERMUTE[1] * act_ratio + M_LAUNCH[1] * depth_ratio
        )
        print(
            f"{preset:2s} B={batch:<2d} params={n_params/1e6:8.1f}M "
            f"step={tflop:7.3f} TFLOP opt={opt_ms:5.1f}ms "
            f"est={1e3/hi_ms:5.2f}-{1e3/lo_ms:5.2f} steps/s "
            f"central={2e3/(lo_ms+hi_ms):5.2f}"
        )


if __name__ == "__main__":
    main()
