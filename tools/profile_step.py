"""Component-level step-time profile of DPOT-M on the real TPU.

Times each piece of the training step (full step / fwd / fwd+bwd / optimizer
/ block / AFNO / block-MLP / norms) with the fetch-fence pattern from
bench.py (rank-0 transfers and block_until_ready are both unreliable on the
tunneled backend). Used to direct the round-2 perf work (VERDICT item 4).

Usage:  python tools/profile_step.py [preset] [batch] [only]
  only: comma-separated subset of
        step,fwd,bwd,opt,model,block,blockbwd,afno,mlp,gn,noise,loss,
        stepnn,stepones,bf16p,bf16pbwd,depth0,depth4
  r4 probes (VERDICT item 2 — attack the fwd+bwd):
    stepnn/stepones  full-step A/B: noise off / mask elided
    bf16p/bf16pbwd   model fwd (+bwd) with params PRE-CAST to bf16 — the
                     delta vs model/bwd is the per-step f32->bf16 param
                     cast+materialize HBM traffic (the f32 master tree is
                     ~0.5 GB at M; reading it every fwd costs ~0.6 ms)
    depth0/depth4    model fwd at depth 0/4 — slope gives the true
                     in-context per-block cost, intercept the head+tail
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dpot_tpu.models import build_model
from dpot_tpu.train.optimizers import build_optimizer
from dpot_tpu.train.schedules import build_schedule
from dpot_tpu.train.state import TrainState
from dpot_tpu.train.step import make_train_step

PRESET = sys.argv[1] if len(sys.argv) > 1 else "M"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 8
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
WARM, ITERS = 3, 20


def want(name):
    return ONLY is None or name in ONLY


def fetch(a):
    from dpot_tpu.utils.profiling import fence

    return fence(a)


def timeit(name, fn, *args, iters=ITERS, probe=None):
    out = None
    for _ in range(WARM):
        out = fn(*args)
    fetch(probe(out) if probe else out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(probe(out) if probe else out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:<40s} {dt:8.3f} ms", flush=True)
    return dt


CHAIN = 50


def chain_time(name, op, z0, reps=CHAIN, params=None):
    """Per-application device time of z -> op(z), measured as a length-`reps`
    scan chain inside ONE jit — the only way to see sub-ms kernels through
    the tunnel's ~1-3ms per-dispatch overhead. The chain is data-dependent
    (each application feeds the next) so nothing is CSE'd or DCE'd.

    When a param tree is involved, pass it via `params` and make `op`
    binary (op(params, z)): the tree then travels as a jit ARGUMENT.
    Closing over it would embed it as HLO constants, which can trip the
    tunnel's remote-compile request limit at the big presets (HTTP 413,
    CLAUDE.md)."""

    @jax.jit
    def chained(p, z):
        def body(c, _):
            r = op(p, c) if params is not None else op(c)
            return r.astype(c.dtype), None

        out, _ = jax.lax.scan(body, z, None, length=reps)
        return out

    for _ in range(WARM):
        out = chained(params, z0)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = chained(params, z0)
    fetch(out)
    dt = (time.perf_counter() - t0) / ITERS / reps * 1e3
    print(f"{name:<40s} {dt:8.3f} ms  (chain of {reps})", flush=True)
    return dt


def main():
    model = build_model(
        "DPOT", preset=PRESET, img_size=128, patch_size=8, in_channels=4,
        in_timesteps=10, out_timesteps=1, modes=32, n_cls=12,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    b = {
        "x": jnp.asarray(rng.standard_normal((BATCH, 128, 128, 10, 4)), jnp.float32),
        "y": jnp.asarray(rng.standard_normal((BATCH, 128, 128, 1, 4)), jnp.float32),
        "msk": jnp.ones((BATCH, 128, 128, 1, 4), jnp.float32),
        "cls": jnp.zeros((BATCH,), jnp.int32),
    }
    params = model.init(jax.random.key(0), b["x"])
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"DPOT-{PRESET} B={BATCH}: {n_params/1e6:.1f}M params", flush=True)
    tx = build_optimizer(
        "lamb", build_schedule("cycle", 1e-3, 1000, 10, 1), grad_clip=1.0
    )

    from dpot_tpu.utils.criterion import rel_lp_loss

    if want("step"):
        state = TrainState.create(model.apply, params, tx, jax.random.key(1))
        step = make_train_step(t_bundle=1, noise_scale=5e-4, donate=False)

        def full(s):
            s2, aux = step(s, b)
            return aux["loss_step"]

        timeit("full train step", full, state)

    if want("stepnn"):
        state = TrainState.create(model.apply, params, tx, jax.random.key(1))
        step_nn = make_train_step(t_bundle=1, noise_scale=0.0, donate=False)

        def full_nn(s):
            s2, aux = step_nn(s, b)
            return aux["loss_step"]

        timeit("full step, noise OFF", full_nn, state)

    if want("stepones"):
        state = TrainState.create(model.apply, params, tx, jax.random.key(1))
        step_om = make_train_step(
            t_bundle=1, noise_scale=5e-4, donate=False, ones_mask=True
        )
        b_nomsk = {k: v for k, v in b.items() if k != "msk"}

        def full_om(s):
            s2, aux = step_om(s, b_nomsk)
            return aux["loss_step"]

        timeit("full step, ones_mask (no msk xfer)", full_om, state)

    def _fwd_loss(params):
        pred, cls = model.apply(params, b["x"])
        return rel_lp_loss(pred, b["y"], b["msk"])

    if want("fwd"):
        timeit("fwd (model+loss)", jax.jit(_fwd_loss), params)

    if want("bwd"):

        @jax.jit
        def fwd_bwd(params):
            l, g = jax.value_and_grad(_fwd_loss)(params)
            # force all grads live via one fused reduction (x*0.0 would be
            # algebraically simplified away; per-leaf plain sums are fine)
            return l + sum(
                jnp.sum(x).astype(jnp.float32) for x in jax.tree.leaves(g)
            ) * 1e-30

        timeit("fwd+bwd (grad)", fwd_bwd, params)

    if want("opt"):
        opt_state = tx.init(params)

        @jax.jit
        def opt_only(g, os_, p):
            # p passed as an argument: a closed-over param tree becomes an
            # HLO constant and blows the remote-compile request size limit
            up, os2 = tx.update(g, os_, p)
            return sum(
                jnp.sum(x).astype(jnp.float32) for x in jax.tree.leaves(up)
            ) * 1e-30

        timeit("optimizer update", opt_only, params, opt_state, params)

    if want("model"):

        @jax.jit
        def fwd_only(params):
            pred, _ = model.apply(params, b["x"])
            return pred

        timeit("model fwd", fwd_only, params, probe=lambda o: o[..., 0, 0])

    if want("bf16p") or want("bf16pbwd"):
        params_bf16 = jax.tree.map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32
            else p,
            params,
        )
        if want("bf16p"):

            @jax.jit
            def fwd_bf16(pp):
                pred, _ = model.apply(pp, b["x"])
                return pred

            timeit(
                "model fwd (pre-cast bf16 params)", fwd_bf16, params_bf16,
                probe=lambda o: o[..., 0, 0],
            )
        if want("bf16pbwd"):

            @jax.jit
            def fwd_bwd_bf16(pp):
                l, g = jax.value_and_grad(
                    lambda q: _fwd_loss(q).astype(jnp.float32)
                )(pp)
                return l + sum(
                    jnp.sum(x).astype(jnp.float32) for x in jax.tree.leaves(g)
                ) * 1e-30

            timeit("fwd+bwd (pre-cast bf16 params)", fwd_bwd_bf16, params_bf16)

    if want("headtail"):
        # depth-0 model applied as an AR chain INSIDE one jit — the
        # device-true head+tail cost. The per-dispatch "model fwd depth=0"
        # line sits on the host issue floor (~2 ms under load) and
        # overstates it ~4x (r4: chained 0.5 ms vs dispatched 2.05 ms).
        m_0 = build_model(
            "DPOT", preset=PRESET, img_size=128, patch_size=8, in_channels=4,
            in_timesteps=10, out_timesteps=1, modes=32, n_cls=12,
            dtype=jnp.bfloat16, depth=0,
        )
        p_0 = m_0.init(jax.random.key(0), b["x"])
        chain_time(
            "head+tail (depth0, chained)",
            lambda p, c: jnp.concatenate(
                [c[..., 1:, :], m_0.apply(p, c)[0]], axis=-2
            ),
            b["x"], params=p_0,
        )

    for dname, dd in (("depth0", 0), ("depth4", 4)):
        if not want(dname):
            continue
        m_d = build_model(
            "DPOT", preset=PRESET, img_size=128, patch_size=8, in_channels=4,
            in_timesteps=10, out_timesteps=1, modes=32, n_cls=12,
            dtype=jnp.bfloat16, depth=dd,
        )
        p_d = m_d.init(jax.random.key(0), b["x"])

        @jax.jit
        def fwd_d(pp, _m=m_d):
            pred, _ = _m.apply(pp, b["x"])
            return pred

        timeit(f"model fwd depth={dd}", fwd_d, p_d, probe=lambda o: o[..., 0, 0])

    # --- pieces at trunk shapes
    D = model.embed_dim
    h = 128 // model.patch_size
    lat = jnp.asarray(rng.standard_normal((BATCH, h, h, D)), jnp.bfloat16)
    bp = params["params"]["blocks_0"]

    from dpot_tpu.models.dpot import Block

    blk = Block(
        width=D, num_blocks=model.n_blocks, modes=32,
        mlp_ratio=model.mlp_ratio, dtype=jnp.bfloat16,
    )

    if want("block"):
        chain_time(
            "one Block fwd",
            lambda z: blk.apply({"params": bp}, z),
            lat,
        )

    if want("blockbwd"):

        def block_grad(z):
            return jax.grad(
                lambda z: jnp.sum(blk.apply({"params": bp}, z).astype(jnp.float32))
            )(z)

        chain_time("one Block fwd+bwd(x)", block_grad, lat)

    if want("afno"):
        from dpot_tpu.ops.activations import get_activation
        from dpot_tpu.ops.spectral import afno_filter_2d

        fp = bp["filter"]
        chain_time(
            "AFNO mixer fwd",
            lambda z: afno_filter_2d(
                z, fp["w1"], fp["b1"], fp["w2"], fp["b2"], 32,
                get_activation("gelu"), compute_dtype=jnp.bfloat16,
            ),
            lat,
        )

    if want("mlp"):
        k1, bb1 = bp["mlp_fc1"]["kernel"], bp["mlp_fc1"]["bias"]
        k2, bb2 = bp["mlp_fc2"]["kernel"], bp["mlp_fc2"]["bias"]

        def blockmlp(z):
            hdn = jax.nn.gelu(
                z @ k1.astype(jnp.bfloat16) + bb1.astype(jnp.bfloat16),
                approximate=False,
            )
            return hdn @ k2.astype(jnp.bfloat16) + bb2.astype(jnp.bfloat16)

        chain_time("block MLP fwd", blockmlp, lat)

    if want("gn"):
        from dpot_tpu.ops.norms import group_norm

        gn_s, gn_b = bp["norm1"]["scale"], bp["norm1"]["bias"]
        chain_time("GroupNorm fwd", lambda z: group_norm(z, gn_s, gn_b, 8), lat)

    if want("noise"):
        key = jax.random.key(3)

        def noise(x):
            xn = jnp.sqrt(jnp.sum(jnp.square(x), axis=(1, 2, 3), keepdims=True))
            return x + 5e-4 * xn * jax.random.normal(key, x.shape, x.dtype)

        chain_time("noise injection", noise, b["x"], reps=20)

    if want("loss"):

        def loss_step(pred):
            return pred + rel_lp_loss(pred, b["y"], b["msk"]) * 1e-30

        chain_time("rel_lp_loss", loss_step, jnp.zeros_like(b["y"]), reps=20)


if __name__ == "__main__":
    main()
