"""Benchmark: DPOT training/inference throughput on one TPU chip.

Default (driver contract): measures the jitted full training step
(fwd + bwd + optimizer, AR rollout T_ar=1) for DPOT-Medium at the
reference's standard operating point — 128^2 grid, patch 8, modes 32,
T_in=10 (configs/pretrain_medium.yaml), bf16 compute / fp32 params — and
prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "steps/sec", "vs_baseline": N}

Knobs:
  DPOT_BENCH_PRESET=Ti|S|M|L|H   model preset (default M)
  DPOT_BENCH_BATCH=N             batch size (default 8)
  DPOT_BENCH_LADDER=1            run the full ladder instead (see LADDER):
      M B=8 (+ fused-kernel A/B), Ti/S B=8, M B=16, lever A/Bs
      (bf16 first moment, fused K-step dispatch), L+remat B=4,
      H+remat B=1 (1.03B on one chip), DPOT3D 64^3, native-512^2 Ti,
      DPOT-M inference (per-dispatch + scanned-rollout), and host ingest —
      one JSON line per entry, each in a FRESH subprocess (first line is
      the headline M/B=8 metric for compatibility).
  DPOT_BENCH_ENTRY=<name>        run one LADDER entry in this process
  DPOT_BENCH_REMAT=1             force remat on the single-preset run
  DPOT_BENCH_MOM=bfloat16        bf16 optimizer moments (A/B the lever)
  DPOT_BENCH_PDTYPE=bfloat16     bf16 working copy of params (f32 master)
  DPOT_BENCH_ACCUM=N             gradient accumulation over N microbatches
  DPOT_BENCH_SCAN=K              fuse K train steps per dispatch (lax.scan)
  DPOT_BENCH_NO_PROBE=1          skip the tunnel-liveness probe (a tiny
      matmul in a subprocess, default timeout 240s via
      DPOT_BENCH_PROBE_TIMEOUT) that otherwise runs first so a wedged
      tunnel yields a fail-fast JSON line + rc=3 instead of a hang

vs_baseline compares against a DERIVED A100 PyTorch step-rate estimate for
the same config (the reference publishes no numbers). Derivation in
BASELINE.md §"Derived A100 baseline estimate": measured 1.563 TFLOP/step
(XLA cost analysis of the f32 step) over an fp32 A100 roofline at the
precision the reference actually runs (no TF32/AMP) -> 6.5-8.5 steps/s,
central 7.5. vs_baseline_tf32 uses the tuned TF32 upper bound (central 20).
"""

import json
import os
import sys
import time

import numpy as np

# central estimates + bands from BASELINE.md's derivation (DPOT-M B=8 128^2)
A100_BASELINE_STEPS_PER_SEC = 7.5       # reference-as-shipped: plain fp32
A100_BASELINE_BAND = (6.5, 8.5)
A100_TF32_STEPS_PER_SEC = 20.0          # upper bound with allow_tf32=True
A100_TF32_BAND = (17.0, 22.0)
DPOT_M_STEP_TFLOP = 1.563               # measured, jax cost_analysis @ B=8

# per-(preset, batch) A100 fp32 estimates (lo, central, hi) steps/s — same
# derivation model applied to each ladder point's measured step FLOPs
# (tools/derive_baselines.py; BASELINE.md §"Per-size baselines"). Before r4
# every entry was ratioed against the M-sized estimate, which under/over-
# stated vs_baseline at other sizes (VERDICT r3 weak #7).
A100_BASELINES = {
    ("Ti", 8): (72.2, 85.2, 104.0),   # 0.102 TFLOP/step
    ("S", 8): (22.6, 26.0, 30.7),     # 0.394
    ("M", 8): (6.5, 7.5, 8.5),        # 1.563 (anchor, full derivation)
    ("M", 16): (3.3, 3.8, 4.3),       # 3.124
    ("L", 4): (3.1, 3.5, 4.0),        # 3.236
    ("H", 1): (5.4, 6.1, 7.0),        # 1.625
}

WARMUP = 3
ITERS = 20


def _fetch(a):
    """Device->host fence (see dpot_tpu.utils.profiling.fence — imported
    lazily so bench.py parses without the package on sys.path)."""
    from dpot_tpu.utils.profiling import fence

    return fence(a)


def bench_train(preset: str, batch: int, remat: bool = False,
                iters: int = ITERS, img: int = 128) -> dict:
    import jax
    import jax.numpy as jnp

    from dpot_tpu.models import build_model
    from dpot_tpu.train.optimizers import build_optimizer
    from dpot_tpu.train.schedules import build_schedule
    from dpot_tpu.train.state import TrainState, training_key
    from dpot_tpu.train.step import make_train_step

    model = build_model(
        "DPOT", preset=preset, img_size=img, patch_size=8, in_channels=4,
        in_timesteps=10, out_timesteps=1, modes=32, n_cls=12,
        dtype=jnp.bfloat16, remat=remat,
    )
    rng = np.random.default_rng(0)
    b = {
        "x": jnp.asarray(rng.standard_normal((batch, img, img, 10, 4)), jnp.float32),
        "y": jnp.asarray(rng.standard_normal((batch, img, img, 1, 4)), jnp.float32),
        "msk": jnp.ones((batch, img, img, 1, 4), jnp.float32),
        "cls": jnp.zeros((batch,), jnp.int32),
    }
    params = model.init(jax.random.key(0), b["x"])
    # memory/traffic levers (off by default — the headline stays the
    # reference-exact configuration): DPOT_BENCH_MOM=bfloat16 stores
    # optimizer moments in bf16; DPOT_BENCH_ACCUM=N scans N microbatches
    mom = os.environ.get("DPOT_BENCH_MOM", "")
    accum = int(os.environ.get("DPOT_BENCH_ACCUM", "1"))
    # DPOT_BENCH_SCAN=K fuses K train steps per dispatch (lax.scan inside
    # one jit — make_train_step(scan_steps=K)); amortizes the per-dispatch
    # host cost that bounds the small presets
    scan_k = int(os.environ.get("DPOT_BENCH_SCAN", "1"))
    tx = build_optimizer(
        "lamb", build_schedule("cycle", 1e-3, 1000, 10, 1), grad_clip=1.0,
        moment_dtype=jnp.bfloat16 if mom == "bfloat16" else None,
    )
    # DPOT_BENCH_PDTYPE=bfloat16: bf16 working copy of the params (f32
    # master stays in the optimizer pass; fwd/bwd read bf16 and emit bf16
    # grads — removes the per-step f32-master read + bf16 materialize from
    # the model pass, ~0.7 GB HBM traffic at M; see train/state.py)
    pdt = os.environ.get("DPOT_BENCH_PDTYPE", "")
    state = TrainState.create(
        model.apply, params, tx, training_key(1),
        param_working_dtype=jnp.bfloat16 if pdt == "bfloat16" else None,
    )
    # DPOT_BENCH_GWIRE=bfloat16: round param-grads to bf16 on the
    # bwd->optimizer wire (f32 params stay the master; the cast fuses into
    # the grad-producing matmuls, halving grad write+read HBM traffic)
    gwire = os.environ.get("DPOT_BENCH_GWIRE", "")
    step = make_train_step(
        t_bundle=1, noise_scale=5e-4, grad_accum=accum, scan_steps=scan_k,
        grad_wire_dtype=jnp.bfloat16 if gwire == "bfloat16" else None,
    )
    if scan_k > 1:
        b = jax.tree.map(lambda a: jnp.stack([a] * scan_k), b)

    for _ in range(WARMUP):
        state, aux = step(state, b)
    _fetch(aux["loss_step"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, aux = step(state, b)
    loss = _fetch(aux["loss_step"])
    dt = (time.perf_counter() - t0) / (iters * scan_k)
    assert np.isfinite(loss)
    sps = 1.0 / dt
    tag = "+remat" if remat else ""
    tag += "+bf16mom" if mom == "bfloat16" else ""
    tag += "+bf16p" if pdt == "bfloat16" else ""
    tag += "+bf16g" if gwire == "bfloat16" else ""
    tag += f"+accum{accum}" if accum > 1 else ""
    tag += f"+scan{scan_k}" if scan_k > 1 else ""
    # per-size estimate where derived (same model+batch, reference-as-
    # shipped fp32); None at other resolutions/batches — a ratio against
    # the M-sized estimate would be apples-to-oranges (VERDICT r3 weak #7)
    base = A100_BASELINES.get((preset, batch)) if img == 128 else None
    out = {
        "metric": f"DPOT-{preset}{tag} train steps/sec/chip (B={batch}, {img}^2, T_in=10, bf16)",
        "value": round(sps, 3),
        "unit": "steps/sec",
        "vs_baseline": round(sps / base[1], 3) if base else None,
    }
    if base:
        out["baseline_est_steps_per_sec"] = base[1]
        out["baseline_band"] = [base[0], base[2]]
    if preset == "M" and batch == 8 and img == 128:
        # the headline config carries the full derivation inputs
        # (BASELINE.md §derived estimate) so the ratio's uncertainty is
        # visible in the recorded JSON
        out.update(
            vs_baseline_band=[
                round(sps / A100_BASELINE_BAND[1], 3),
                round(sps / A100_BASELINE_BAND[0], 3),
            ],
            vs_baseline_tf32=round(sps / A100_TF32_STEPS_PER_SEC, 3),
            step_tflop=DPOT_M_STEP_TFLOP,
        )
    return out


def bench_train_3d(batch: int = 2, size: int = 64, iters: int = ITERS) -> dict:
    import jax
    import jax.numpy as jnp

    from dpot_tpu.models import build_model
    from dpot_tpu.train.optimizers import build_optimizer
    from dpot_tpu.train.schedules import build_schedule
    from dpot_tpu.train.state import TrainState, training_key
    from dpot_tpu.train.step import make_train_step, wrap_pred_only

    model = build_model(
        "DPOT3D", img_size=size, patch_size=8, in_channels=4,
        in_timesteps=10, out_timesteps=1, modes=8, n_cls=12,
        embed_dim=512, depth=4, n_blocks=4, dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    b = {
        "x": jnp.asarray(
            rng.standard_normal((batch, size, size, size, 10, 4)), jnp.float32
        ),
        "y": jnp.asarray(
            rng.standard_normal((batch, size, size, size, 1, 4)), jnp.float32
        ),
        "msk": jnp.ones((batch, size, size, size, 1, 4), jnp.float32),
        "cls": jnp.zeros((batch,), jnp.int32),
    }
    params = model.init(jax.random.key(0), b["x"])
    tx = build_optimizer(
        "lamb", build_schedule("cycle", 1e-3, 1000, 10, 1), grad_clip=1.0
    )
    apply_fn = wrap_pred_only(model.apply, n_cls=12)
    state = TrainState.create(apply_fn, params, tx, training_key(1))
    step = make_train_step(t_bundle=1, noise_scale=5e-4)
    for _ in range(WARMUP):
        state, aux = step(state, b)
    _fetch(aux["loss_step"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, aux = step(state, b)
    loss = _fetch(aux["loss_step"])
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(loss)
    return {
        "metric": f"DPOT3D train steps/sec/chip (B={batch}, {size}^3, bf16)",
        "value": round(1.0 / dt, 3),
        "unit": "steps/sec",
        "vs_baseline": None,
    }


def bench_inference(preset: str = "M", batch: int = 8, iters: int = 50) -> dict:
    """Single AR-step inference latency (evaluate.py:197-199,222)."""
    import jax
    import jax.numpy as jnp

    from dpot_tpu.models import build_model

    model = build_model(
        "DPOT", preset=preset, img_size=128, patch_size=8, in_channels=4,
        in_timesteps=10, out_timesteps=1, modes=32, n_cls=12,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 128, 128, 10, 4)), jnp.float32)
    params = model.init(jax.random.key(0), x)

    @jax.jit
    def ar_step(params, x):
        pred, _ = model.apply(params, x)
        return jnp.concatenate([x[..., 1:, :], pred], axis=-2)

    for _ in range(WARMUP):
        x = ar_step(params, x)
    _fetch(x[..., 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        x = ar_step(params, x)
    _fetch(x[..., 0, 0])
    dt = (time.perf_counter() - t0) / iters
    return {
        "metric": f"DPOT-{preset} AR-inference latency (B={batch}, 128^2, bf16)",
        "value": round(dt * 1e3, 3),
        "unit": "ms/step",
        "vs_baseline": None,
    }


# Ladder entries: name -> callable. Each runs in a FRESH subprocess —
# sharing one process poisons small-model numbers (leftover XLA
# arenas/state from the big runs measured Ti at 93 steps/s in-process vs
# 175 standalone), and the entries stay sequential (one TPU client).
LADDER = {
    "m8": lambda: bench_train("M", 8),
    "m8_fused": lambda: _fused_ab(),
    "ti8": lambda: bench_train("Ti", 8),
    "s8": lambda: bench_train("S", 8),
    "m16": lambda: bench_train("M", 16),
    # r3 levers, A/B'd against their baselines above:
    # bf16 FIRST-moment storage (optimizer pass is HBM-bound)
    "m8_bf16mom": lambda: _env_train({"DPOT_BENCH_MOM": "bfloat16"}, "M", 8),
    # fused multi-step dispatch (small models are dispatch-bound)
    "ti8_scan8": lambda: _env_train({"DPOT_BENCH_SCAN": "8"}, "Ti", 8),
    "s8_scan4": lambda: _env_train({"DPOT_BENCH_SCAN": "4"}, "S", 8),
    # fused dispatch at M — reference-exact numerics, amortizes the
    # ~2-3 ms/dispatch tunnel host cost that the single-step headline
    # pays (r4: Ti scan8 measured a 3.3 ms/dispatch gap)
    "m8_scan4": lambda: _env_train({"DPOT_BENCH_SCAN": "4"}, "M", 8),
    # r4 lever: bf16 working copy of the params (f32 master in the
    # optimizer pass only; fwd/bwd read bf16, grads arrive bf16)
    "m8_bf16p": lambda: _env_train({"DPOT_BENCH_PDTYPE": "bfloat16"}, "M", 8),
    # the combined fast recipe at M: bf16 mu + bf16 working params +
    # 4-step fused dispatch (reference-exact f32 stays the headline)
    "m8_fast": lambda: _env_train(
        {
            "DPOT_BENCH_MOM": "bfloat16",
            "DPOT_BENCH_PDTYPE": "bfloat16",
            "DPOT_BENCH_SCAN": "4",
        },
        "M", 8,
    ),
    # r5 lever: bf16 param-grads on the bwd->optimizer wire (f32 params;
    # the last un-roofline'd HBM stream per PROFILE_r04 — ~0.5 GB of f32
    # grad write+read at M)
    "m8_bf16g": lambda: _env_train({"DPOT_BENCH_GWIRE": "bfloat16"}, "M", 8),
    "l4_remat": lambda: bench_train("L", 4, remat=True, iters=10),
    # 1.03B DPOT-H on ONE 16GB chip: donation + remat fit params (4.1GB)
    # + f32 lamb moments (8.2GB) + grads/activations; ~15 steps/s at B=1,
    # ~10.9 at B=4
    "h1_remat": lambda: bench_train("H", 1, remat=True, iters=10),
    # samples/s-optimal operating points per preset: sweep (B, accum,
    # scan) with bf16 first moment (+remat for L/H), report the best
    # (VERDICT r3 item 9 / r4 item 4)
    "m_best": lambda: bench_m_sweep(),
    "l_best": lambda: bench_l_sweep(),
    "h_best": lambda: bench_h_sweep(),
    "3d": lambda: bench_train_3d(),
    # native 512^2 training on ONE chip (the reference downscales >128^2
    # data, griddataset.py:96; multi-chip spatial sharding scales further)
    "ti_512": lambda: bench_train("Ti", 2, remat=True, iters=10, img=512),
    "infer_b1": lambda: bench_inference("M", 1),
    "infer_b8": lambda: bench_inference("M", 8),
    "infer_scan_b1": lambda: bench_inference_scan("M", 1),
    "infer_scan_b8": lambda: bench_inference_scan("M", 8),
    # full HTTP serving stack latency with p50/p99 (VERDICT r4 item 7).
    # Default wire is auto -> bf16 request tensors for this bf16 model
    # (bit-identical predictions, half the H2D bytes; r5 lever, measured
    # p50 -36% at steps=1); the _f32wire twins keep the A/B reproducible.
    "serve_b1": lambda: bench_serve(batch=1, steps=1),
    "serve_b1_s20": lambda: bench_serve(batch=1, steps=20, n_req=30),
    "serve_b1_f32wire": lambda: (
        os.environ.update({"DPOT_BENCH_SERVE_WIRE": "float32"})
        or bench_serve(batch=1, steps=1)
    ),
    "serve_b1_s20_f32wire": lambda: (
        os.environ.update({"DPOT_BENCH_SERVE_WIRE": "float32"})
        or bench_serve(batch=1, steps=20, n_req=30)
    ),
    # + fp16 response wire (opt-in): halves the per-frame D2H + HTTP
    # response bytes — first-order at steps=20 where the response is 20x
    # the per-frame size (PROFILE_r05 serve decomposition)
    "serve_b1_s20_f16resp": lambda: (
        os.environ.update({"DPOT_BENCH_SERVE_RESP": "float16"})
        or bench_serve(batch=1, steps=20, n_req=30)
    ),
    # host-side: on-disk HDF5 ingest rate vs the chip's consumption
    # (SURVEY §7 hard part (d); no TPU involved)
    "ingest": lambda: bench_ingest(),
    "ingest_tm": lambda: bench_ingest(time_major=True),
}


def bench_best_sweep(preset: str, combos, remat: bool, iters: int) -> dict:
    """samples/s-optimal single-chip operating point for one preset: sweep
    (batch, grad-accum, scan_steps) under bf16 first moment (+remat where
    the preset needs it), pick the best samples/s (VERDICT r4 item 4 — the
    headline fixates B=8 but the f32 lamb pass is a fixed per-step cost
    that larger batches amortize). Each combo runs in THIS process
    sequentially (one TPU client; arena reuse across combos is acceptable
    for the big presets, which are not dispatch-bound). OOM/compile
    failures skip the combo."""
    os.environ["DPOT_BENCH_MOM"] = "bfloat16"
    best = None
    tried = []
    for batch, accum, scan in combos:
        os.environ["DPOT_BENCH_ACCUM"] = str(accum)
        os.environ["DPOT_BENCH_SCAN"] = str(scan)
        try:
            r = bench_train(preset, batch, remat=remat, iters=iters)
        except Exception as e:  # OOM or compile failure: combo infeasible
            tried.append(
                f"B={batch},accum={accum},scan={scan}: FAILED {type(e).__name__}"
            )
            continue
        sps = r["value"] * batch
        tried.append(
            f"B={batch},accum={accum},scan={scan}: "
            f"{r['value']} steps/s = {sps:.1f} samples/s"
        )
        if best is None or sps > best[0]:
            best = (sps, batch, accum, scan, r)
    os.environ.pop("DPOT_BENCH_ACCUM", None)
    os.environ.pop("DPOT_BENCH_SCAN", None)
    if best is None:
        return {"metric": f"DPOT-{preset} sweep: all combos failed",
                "value": None, "unit": "", "vs_baseline": None, "tried": tried}
    sps, batch, accum, scan, r = best
    # vs_baseline in SAMPLES/s against the same-batch per-size A100 row
    # where one exists (steps/s ratios are the same thing at equal batch)
    base = A100_BASELINES.get((preset, batch))
    return {
        "metric": (
            f"DPOT-{preset} best samples/s config (B={batch}, accum={accum}, "
            f"scan={scan}, {'remat, ' if remat else ''}bf16 mu, 128^2, bf16)"
        ),
        "value": round(sps, 2),
        "unit": "samples/sec",
        "vs_baseline": round(sps / (base[1] * batch), 3) if base else None,
        "steps_per_sec": r["value"],
        "tried": tried,
    }


def bench_h_sweep() -> dict:
    """DPOT-H (1.03B): remat + donation fit it on one 16GB chip; sweep the
    memory-feasible (B, accum) frontier."""
    return bench_best_sweep(
        "H", ((1, 1, 1), (2, 1, 1), (4, 1, 1), (4, 2, 1), (8, 2, 1)),
        remat=True, iters=8,
    )


def bench_m_sweep() -> dict:
    """DPOT-M: B=16 amortizes the fixed 4.75 ms f32 lamb pass (r2 measured
    ~470 samples/s vs 422 at B=8, never revisited with scan4 + bf16-mu)."""
    return bench_best_sweep(
        "M", ((8, 1, 4), (16, 1, 1), (16, 1, 4), (32, 1, 1), (32, 2, 1)),
        remat=False, iters=12,
    )


def bench_l_sweep() -> dict:
    """DPOT-L (509M) under remat: the r2 ladder only ever ran B=4."""
    return bench_best_sweep(
        "L", ((4, 1, 1), (4, 1, 2), (8, 1, 1), (8, 2, 1), (16, 2, 1)),
        remat=True, iters=8,
    )


def bench_serve(batch: int = 1, steps: int = 1, n_req: int = 60) -> dict:
    """End-to-end serving latency through the real HTTP stack (VERDICT r4
    item 7): start serve/server.py on loopback, POST n_req sequential
    /rollout requests (.npy bodies, B=batch, `steps` model applications
    each), report p50/p99 wall latency per request. Covers request parse +
    micro-batcher queue + jitted rollout + device fetch + response — the
    figure a deployment actually sees (bench_inference* isolate the device
    kernel). Single in-flight client, so no batching benefit is measured
    here; /metrics' batch counters are carried in the JSON for context."""
    import io
    import urllib.request

    import jax
    import jax.numpy as jnp

    from dpot_tpu.models import build_model
    from dpot_tpu.serve import serve

    model = build_model(
        "DPOT", preset="M", img_size=128, patch_size=8, in_channels=4,
        in_timesteps=10, out_timesteps=1, modes=32, n_cls=12,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((batch, 128, 128, 10, 4)), jnp.float32)
    params = model.init(jax.random.key(0), x0)
    wire = os.environ.get("DPOT_BENCH_SERVE_WIRE", "auto")
    resp = os.environ.get("DPOT_BENCH_SERVE_RESP", "float32")
    httpd, rs = serve(
        model, params, port=0, batch_buckets=(batch,), max_wait_ms=0.0,
        wire_dtype=wire, response_dtype=resp,
    )
    try:
        port = httpd.server_address[1]
        x = np.asarray(rng.standard_normal((batch, 128, 128, 10, 4)), np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        body = buf.getvalue()

        def one() -> float:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/rollout?steps={steps}",
                data=body, method="POST",
            )
            t0 = time.perf_counter()
            with urllib.request.urlopen(req, timeout=300) as r:
                r.read()
            return (time.perf_counter() - t0) * 1e3

        for _ in range(5):  # warm: compile the (bucket, steps) rollout
            one()
        lat = sorted(one() for _ in range(n_req))
        p50 = lat[len(lat) // 2]
        p99 = lat[min(len(lat) - 1, int(len(lat) * 0.99))]
    finally:
        httpd.shutdown()
        rs.stop()
    return {
        "metric": (
            f"DPOT-M serve HTTP rollout latency p50 "
            f"(B={batch}, steps={steps}, 128^2, bf16"
            + (f", wire={rs.wire_dtype.name}" if wire != "float32" else ", wire=float32")
            + (f", resp={resp}" if resp != "float32" else "")
            + ")"
        ),
        "value": round(p50, 3),
        "unit": "ms/request",
        "vs_baseline": None,
        "p99_ms": round(p99, 3),
        "mean_ms": round(sum(lat) / len(lat), 3),
    }


def _env_train(env: dict, preset: str, batch: int) -> dict:
    """Run bench_train with lever knobs set (each ladder entry already runs
    in its own subprocess, so the env mutation is isolated)."""
    os.environ.update(env)
    return bench_train(preset, batch)


def _fused_ab() -> dict:
    """Fused GN+AFNO Pallas kernel A/B line (VERDICT r1 item 10): measured
    at parity with the XLA-composed default — recorded so the comparison
    stays reproducible."""
    os.environ["DPOT_AFNO_IMPL"] = "fused"
    r = bench_train("M", 8)
    r["metric"] = r["metric"].replace(
        "DPOT-M", "DPOT-M [DPOT_AFNO_IMPL=fused pallas]"
    )
    return r


def bench_inference_scan(
    preset: str = "M", batch: int = 1, t_test: int = 20, iters: int = 10
) -> dict:
    """Amortized AR-step latency with the WHOLE trajectory rolled inside
    one jit (lax.scan — the evaluate/serving path). The per-dispatch
    bench_inference number includes ~3-4 ms of tunnel dispatch overhead per
    step; this is the device-bound figure."""
    import jax
    import jax.numpy as jnp

    from dpot_tpu.models import build_model
    from dpot_tpu.train.step import make_eval_rollout

    model = build_model(
        "DPOT", preset=preset, img_size=128, patch_size=8, in_channels=4,
        in_timesteps=10, out_timesteps=1, modes=32, n_cls=12,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    b = {
        "x": jnp.asarray(rng.standard_normal((batch, 128, 128, 10, 4)), jnp.float32),
        "y": jnp.zeros((batch, 128, 128, t_test, 4), jnp.float32),
        "msk": jnp.ones((batch, 128, 128, 1, 4), jnp.float32),
    }
    params = model.init(jax.random.key(0), b["x"])
    roll = make_eval_rollout(t_bundle=1)
    for _ in range(WARMUP):
        out = roll(model.apply, params, b)
    _fetch(out["loss_full"])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = roll(model.apply, params, b)
    _fetch(out["loss_full"])
    dt = (time.perf_counter() - t0) / iters / t_test * 1e3
    return {
        "metric": (
            f"DPOT-{preset} scanned-rollout latency "
            f"(B={batch}, {t_test} steps in one jit, 128^2, bf16)"
        ),
        "value": round(dt, 3),
        "unit": "ms/step",
        "vs_baseline": None,
    }


def bench_ingest(n_files: int = 128, res: int = 128, batch: int = 8,
                 epochs: int = 3, time_major: bool = False) -> dict:
    """On-disk HDF5 ingest rate: DataLoader end-to-end over a scatter
    corpus at the pretraining shape (res^2 x 21 x 4 f32, one trajectory
    per file — reference utils/griddataset.py:88-117 + DataLoader
    train_temporal.py:108-109). Measures the windowed-read + raw-memmap +
    fetch_into path (data/raw_hdf5.py, loader.py) that has to outrun the
    chip's sample consumption (SURVEY §7 hard part (d)). The corpus is
    cached under /tmp and re-read warm — matching epochs >=2 of a real
    run (epoch 1 is disk-bound once, page cache after)."""
    import tempfile

    from dpot_tpu.data.generation import generate_synthetic_corpus
    from dpot_tpu.data.grid_dataset import MixedTemporalDataset
    from dpot_tpu.data.loader import DataLoader

    name = f"ns2d_ingest_{res}" + ("_tm" if time_major else "")
    root = os.path.join(tempfile.gettempdir(), "dpot_ingest_corpus")
    marker = os.path.join(root, name, "train", f"data_{n_files - 1}.hdf5")
    if not os.path.exists(marker):
        generate_synthetic_corpus(
            root, name=name, n_train=n_files, n_test=2,
            in_size=(res, res), t_total=21, n_channels=4,
            time_major=time_major,
        )
    os.environ["DPOT_DATA_ROOT"] = root
    from dpot_tpu.data.registry import DatasetSpec, register_dataset

    register_dataset(DatasetSpec(
        name=name, train_path=f"{name}/train", test_path=f"{name}/test",
        train_size=n_files, test_size=2, scatter_storage=True, t_test=10,
        t_in=10, t_total=21, in_size=(res, res), n_channels=4,
        downsample=(1, 1),
    ))
    ds = MixedTemporalDataset(name, res=res, t_in=10, t_ar=1,
                              n_channels=4, train=True)
    import ml_dtypes

    # configs: the r2 threaded loader, the r5 inline+recycled-slots
    # loader, and the same with the bf16 wire fold — the configuration
    # cli/train actually uses for a bf16 Ti run (loader_prefetch auto +
    # wire_dtype auto). Best-of-N per config with a CPU warm spin between
    # trials (this VM's 1 vCPU has multi-second steal bursts; single
    # runs are meaningless — CLAUDE.md host-measurement trap).
    cfgs = {
        "threaded_f32": dict(num_workers=1),
        "inline_ring_f32": dict(num_workers=1, prefetch=0, slot_ring=2),
        "inline_ring_bf16": dict(
            num_workers=1, prefetch=0, slot_ring=2,
            x_dtype=ml_dtypes.bfloat16, y_dtype=ml_dtypes.bfloat16,
        ),
    }
    dls = {
        tag: DataLoader(ds, batch_size=batch, shuffle=True, **kw)
        for tag, kw in cfgs.items()
    }
    per_cfg = {tag: 0.0 for tag in cfgs}
    for b in dls["threaded_f32"]:  # fault the corpus into page cache once
        pass
    for _ in range(max(epochs, 4)):
        t0 = time.perf_counter()  # warm the vCPU out of any ramp state
        while time.perf_counter() - t0 < 1.0:
            pass
        for tag, dl in dls.items():
            t0 = time.perf_counter()
            n = 0
            for b in dl:
                n += b[0].shape[0]
            per_cfg[tag] = max(per_cfg[tag], n / (time.perf_counter() - t0))
    best = max(per_cfg.values())
    # consumption rates from the measured ladder (BENCH_LADDER jsonl):
    # DPOT-M B=8 ~53 steps/s -> ~424 samples/s; Ti ~189 -> ~1512
    tag = "time-major layout, " if time_major else ""
    return {
        "metric": (
            f"ingest samples/s (scatter HDF5 {res}^2x21x4, {tag}windowed "
            f"memmap reads, B={batch}, warm cache)"
        ),
        "value": round(best, 1),
        "unit": "samples/sec",
        "vs_baseline": None,
        "x_dpot_m_consumption": round(best / 424.0, 2),
        "x_dpot_ti_consumption": round(best / 1512.0, 2),
        # demand at the ti8_scan8 headline (308 steps/s * B=8, r4 ladder)
        "x_dpot_ti_scan8_demand": round(best / 2466.0, 2),
        "per_config": {k: round(v, 1) for k, v in per_cfg.items()},
    }


def _probe_tunnel() -> bool:
    """Fail-fast liveness check of the TPU tunnel before benching.

    The tunnel has a known outage mode (seen rounds 3 and 5, can last >7h)
    in which even a 4x4 matmul hangs forever; a bench started then would
    hang the driver instead of recording an honest failure. Runs a tiny
    matmul + host fetch in a subprocess under a timeout. Skipped (returns
    True) when DPOT_BENCH_NO_PROBE is set or when forced onto CPU.
    """
    if os.environ.get("DPOT_BENCH_NO_PROBE"):
        return True
    import subprocess

    code = (
        "import jax, jax.numpy as jnp, numpy as np\n"
        # rank-0 device->host transfers are unimplemented on this plugin;
        # fetch via a (1,1) reshape (CLAUDE.md environment gotchas)
        "x = jnp.ones((4, 4), jnp.float32)\n"
        "v = np.asarray((x @ x).sum().reshape(1, 1))[0, 0]\n"
        "assert v == 64.0, v\n"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True,
            timeout=int(os.environ.get("DPOT_BENCH_PROBE_TIMEOUT", "240")),
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    entry = os.environ.get("DPOT_BENCH_ENTRY")
    if entry:
        print(json.dumps(LADDER[entry]()), flush=True)
        return

    if not _probe_tunnel():
        print(
            json.dumps({
                "metric": "TPU tunnel DOWN (tiny-matmul probe timed out; "
                          "known outage mode — no measurement possible)",
                "value": None, "unit": "", "vs_baseline": None,
            }),
            flush=True,
        )
        sys.exit(3)

    if os.environ.get("DPOT_BENCH_LADDER"):
        import subprocess

        only = os.environ.get("DPOT_BENCH_ONLY")  # comma-list subset
        for name in LADDER:
            if only and name not in only.split(","):
                continue
            env = dict(os.environ, DPOT_BENCH_ENTRY=name)
            env.pop("DPOT_BENCH_LADDER", None)
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)], env=env,
                    capture_output=True, text=True,
                    timeout=int(os.environ.get("DPOT_BENCH_TIMEOUT", "2400")),
                )
            except subprocess.TimeoutExpired:
                print(
                    json.dumps({"metric": f"ladder entry {name} TIMEOUT",
                                "value": None, "unit": "",
                                "vs_baseline": None}),
                    flush=True,
                )
                continue
            for line in proc.stdout.splitlines():
                if line.startswith("{"):
                    print(line, flush=True)
            if proc.returncode != 0:
                print(
                    json.dumps({"metric": f"ladder entry {name} FAILED",
                                "value": None, "unit": "",
                                "vs_baseline": None}),
                    flush=True,
                )
                sys.stderr.write(proc.stderr[-2000:] + "\n")
        return

    preset = os.environ.get("DPOT_BENCH_PRESET", "M")
    batch = int(os.environ.get("DPOT_BENCH_BATCH", "8"))
    remat = bool(os.environ.get("DPOT_BENCH_REMAT"))
    print(json.dumps(bench_train(preset, batch, remat=remat)))


if __name__ == "__main__":
    main()
