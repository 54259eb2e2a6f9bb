"""Pipeline parallelism ('pipe' mesh axis): GPipe schedule correctness vs
the sequential trunk, pipelined-DPOT forward/grad/train-step equivalence
with the dense model, graceful degradation on awkward batch sizes — all on
the 8-device CPU mesh. (The reference has no pipeline strategy; this is
repo-original machinery, parallel/pipeline.py.)"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dpot_tpu.models.dpot import DPOTNet
from dpot_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from dpot_tpu.parallel.pipeline import pipeline_blocks
from dpot_tpu.train.optimizers import build_optimizer
from dpot_tpu.train.state import TrainState
from dpot_tpu.train.step import make_train_step

pytestmark = pytest.mark.multichip

MODEL_KW = dict(
    img_size=16, patch_size=4, in_channels=2, out_channels=2,
    in_timesteps=4, out_timesteps=1, embed_dim=32, depth=4, n_blocks=4,
    modes=4, n_cls=3,
)


def _models(mesh, **extra):
    dense = DPOTNet(**MODEL_KW)
    piped = DPOTNet(**MODEL_KW, pipe_mesh=mesh, **extra)
    return dense, piped


def _batch(B, T_ar=1, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, 16, 16, 4, 2)).astype(np.float32)
    y = np.tile(x[..., -1:, :], (1, 1, 1, T_ar, 1))
    return {
        "x": jnp.asarray(x),
        "y": jnp.asarray(y),
        "msk": jnp.ones((B, 16, 16, 1, 2), jnp.float32),
        "cls": jnp.zeros((B,), jnp.int32),
    }


def test_pipeline_blocks_unit():
    """The GPipe schedule == the sequential trunk for a toy block, across
    stage counts, layers-per-stage > 1, and microbatch counts (including
    n_micro that does NOT divide the batch — graceful degradation)."""
    D = 8
    L = 8
    rng = np.random.default_rng(1)
    layers = [
        {
            "w": jnp.asarray(rng.standard_normal((D, D)).astype(np.float32) * 0.3),
            "b": jnp.asarray(rng.standard_normal((D,)).astype(np.float32)),
        }
        for _ in range(L)
    ]

    def block_apply(p, c):
        return jnp.tanh(c @ p["w"] + p["b"]) + c

    x = jnp.asarray(rng.standard_normal((12, 5, D)).astype(np.float32))
    want = x
    for p in layers:
        want = block_apply(p, want)

    for pipe, n_micro in [(4, 4), (4, 6), (2, 12), (8, 5), (4, 64)]:
        mesh = make_mesh(pipe=pipe)
        got = jax.jit(
            lambda xx: pipeline_blocks(layers, xx, mesh, block_apply, n_micro)
        )(x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-6,
            err_msg=f"pipe={pipe} n_micro={n_micro}",
        )


def test_pipelined_model_matches_dense():
    """Pipelined DPOT forward AND gradients == the dense model on the same
    params (dp=2 x pipe=4); also at a batch the microbatching can't split
    evenly (B=6 with 4 stages)."""
    mesh = make_mesh(data=2, pipe=4)
    dense, piped = _models(mesh)
    for B in (8, 6):
        batch = _batch(B)
        v = dense.init(jax.random.key(1), batch["x"])
        yd, cd = jax.jit(dense.apply)(v, batch["x"])
        yp, cp = jax.jit(piped.apply)(v, batch["x"])
        np.testing.assert_allclose(np.asarray(yd), np.asarray(yp), atol=1e-6)
        np.testing.assert_allclose(np.asarray(cd), np.asarray(cp), atol=1e-6)

        def loss(vv, m, xx):
            y, c = m.apply(vv, xx)
            return jnp.mean(y**2) + jnp.mean(c**2)

        gd = jax.jit(jax.grad(lambda vv: loss(vv, dense, batch["x"])))(v)
        gp = jax.jit(jax.grad(lambda vv: loss(vv, piped, batch["x"])))(v)
        for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gp)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            )


def test_pipelined_remat_matches_dense():
    """remat=True routes the pipeline's per-block apply through
    jax.checkpoint — gradients must be unchanged."""
    mesh = make_mesh(data=1, pipe=8)
    dense = DPOTNet(**{**MODEL_KW, "depth": 8})
    piped = DPOTNet(**{**MODEL_KW, "depth": 8}, pipe_mesh=mesh, remat=True)
    batch = _batch(8)
    v = dense.init(jax.random.key(2), batch["x"])

    def loss(vv, m):
        y, c = m.apply(vv, batch["x"])
        return jnp.mean(y**2) + jnp.mean(c**2)

    gd = jax.jit(jax.grad(lambda vv: loss(vv, dense)))(v)
    gp = jax.jit(jax.grad(lambda vv: loss(vv, piped)))(v)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pipelined_bf16_matches_dense_bf16():
    """The perf path (bf16 compute) through the pipeline: the trunk's
    zeros-initialized ring buffers must carry the model dtype, and the
    schedule must stay exact vs the dense bf16 model."""
    mesh = make_mesh(data=2, pipe=4)
    kw = {**MODEL_KW, "dtype": jnp.bfloat16}
    dense = DPOTNet(**kw)
    piped = DPOTNet(**kw, pipe_mesh=mesh)
    batch = _batch(8)
    v = dense.init(jax.random.key(3), batch["x"])
    yd, cd = jax.jit(dense.apply)(v, batch["x"])
    yp, cp = jax.jit(piped.apply)(v, batch["x"])
    # identical schedule-invariant math: bitwise equality is too strict
    # across layouts, but bf16 outputs should agree to bf16 resolution
    np.testing.assert_allclose(
        np.asarray(yd, np.float32), np.asarray(yp, np.float32),
        atol=2e-2, rtol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(cd, np.float32), np.asarray(cp, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_pipeline_composes_with_fsdp_placement():
    """PP is an execution schedule, orthogonal to placement: FSDP-sharding
    the params over 'data' while the trunk runs pipelined must reproduce
    the replicated pipelined step."""
    from dpot_tpu.parallel.fsdp import shard_state_fsdp

    batch = _batch(8)
    tx = build_optimizer("adam", 1e-3, grad_clip=1.0)
    step = make_train_step(t_bundle=1, noise_scale=0.0, donate=False)
    mesh = make_mesh(data=2, pipe=4)
    _, piped = _models(mesh)
    params = piped.init(jax.random.key(0), batch["x"])

    with mesh:
        s_rep = replicate(
            TrainState.create(piped.apply, params, tx, jax.random.key(0)),
            mesh,
        )
        s_fsdp = shard_state_fsdp(
            TrainState.create(piped.apply, params, tx, jax.random.key(0)),
            mesh, min_size=256,
        )
        for _ in range(2):
            s_rep, aux_r = step(s_rep, shard_batch(batch, mesh))
            s_fsdp, aux_f = step(s_fsdp, shard_batch(batch, mesh))

    np.testing.assert_allclose(
        float(jnp.reshape(aux_r["loss_step"], ())),
        float(jnp.reshape(aux_f["loss_step"], ())), rtol=1e-5,
    )
    for a, b in zip(
        jax.tree.leaves(jax.device_get(s_rep.params)),
        jax.tree.leaves(jax.device_get(s_fsdp.params)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_pipeline_train_step_matches_dp():
    """dp=2 x pipe=4 training == replicated dp=8 training, step for step
    (same schedule-as-execution guarantee the TP test pins)."""
    batch = _batch(8)
    tx = build_optimizer("adam", 1e-3, grad_clip=1.0)
    step = make_train_step(t_bundle=1, noise_scale=0.0, donate=False)

    mesh_dp = make_mesh(data=8)
    mesh_pp = make_mesh(data=2, pipe=4)
    dense, piped = _models(mesh_pp, pipe_microbatches=4)
    params = dense.init(jax.random.key(0), batch["x"])

    with mesh_dp:
        s_d = replicate(
            TrainState.create(dense.apply, params, tx, jax.random.key(0)),
            mesh_dp,
        )
        for _ in range(3):
            s_d, aux_d = step(s_d, shard_batch(batch, mesh_dp))

    with mesh_pp:
        s_p = replicate(
            TrainState.create(piped.apply, params, tx, jax.random.key(0)),
            mesh_pp,
        )
        for _ in range(3):
            s_p, aux_p = step(s_p, shard_batch(batch, mesh_pp))

    np.testing.assert_allclose(
        float(jnp.reshape(aux_d["loss_step"], ())),
        float(jnp.reshape(aux_p["loss_step"], ())), rtol=1e-5,
    )
    for a, b in zip(
        jax.tree.leaves(jax.device_get(s_d.params)),
        jax.tree.leaves(jax.device_get(s_p.params)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_pipeline_through_train_cli_config(tmp_path):
    """--mesh_pipe reaches the train loop: a 2-epoch pipelined run produces
    finite, decreasing-ish loss and a restorable checkpoint."""
    from dpot_tpu.data.registry import make_synthetic_spec
    from dpot_tpu.train.loop import train
    from dpot_tpu.utils.config import TrainConfig

    make_synthetic_spec(
        "pipe_cli", train_size=16, test_size=8, t_total=12, t_test=2,
        in_size=(16, 16), n_channels=2,
    )
    cfg = TrainConfig(
        model="DPOT", train_paths=["pipe_cli"], res=16, patch_size=4,
        width=32, n_layers=4, n_blocks=4, modes=4, T_in=6, batch_size=8,
        epochs=2, num_workers=2, lr=1e-3, opt="adam", use_writer=True,
        mesh_data=2, mesh_pipe=4,
    )
    out = train(cfg, log_dir=str(tmp_path / "run"))
    assert np.isfinite(out["train_l2_step"])
    assert (tmp_path / "run" / "model").exists()
