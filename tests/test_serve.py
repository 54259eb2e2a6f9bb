"""Rollout serving: micro-batched jitted AR rollout behind HTTP.

Checks (CPU backend): server warmup + health, correctness of a served
rollout vs a direct model scan, micro-batching of concurrent requests into
one device step, and the CLI wiring."""

import io
import json
import threading
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dpot_tpu.models import build_model


@pytest.fixture(scope="module")
def served():
    from dpot_tpu.serve import serve

    model = build_model(
        "DPOT", img_size=16, patch_size=4, in_channels=2, in_timesteps=4,
        out_timesteps=1, embed_dim=32, depth=1, n_blocks=4, modes=4, n_cls=1,
    )
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 4, 2)))
    httpd, rs = serve(
        model, params, port=0, batch_buckets=(1, 2, 4), max_wait_ms=30.0
    )
    port = httpd.server_address[1]
    yield model, params, rs, port
    httpd.shutdown()
    rs.stop()


def _post_rollout(port, x, steps):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/rollout?steps={steps}", method="POST"
    )
    buf = io.BytesIO()
    np.save(buf, x)
    req.data = buf.getvalue()
    with urllib.request.urlopen(req, timeout=60) as r:
        return np.load(io.BytesIO(r.read()))


def test_healthz_and_rollout_correctness(served):
    model, params, rs, port = served
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/healthz", timeout=30
    ) as r:
        h = json.loads(r.read())
    assert h["ok"] and h["model"] == "DPOTNet"

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 16, 16, 4, 2)).astype(np.float32)
    steps = 3
    pred = _post_rollout(port, x, steps)
    assert pred.shape == (1, 16, 16, steps, 2)

    # direct reference rollout
    xc = jnp.asarray(x)
    outs = []
    for _ in range(steps):
        im, _ = model.apply(params, xc)
        outs.append(np.asarray(im))
        xc = jnp.concatenate([xc[..., 1:, :], im], axis=-2)
    want = np.concatenate(outs, axis=-2)
    np.testing.assert_allclose(pred, want, atol=1e-5, rtol=1e-5)


def test_bf16_wire_exact():
    """wire_dtype='auto' ships bf16 requests for a bf16-compute model and
    the results are BIT-IDENTICAL to the f32 wire (the model's first op
    casts the input to bf16 either way); an f32-compute model must keep
    the f32 wire under auto."""
    from dpot_tpu.serve import RolloutServer

    kw = dict(img_size=16, patch_size=4, in_channels=2, in_timesteps=4,
              out_timesteps=1, embed_dim=32, depth=1, n_blocks=4, modes=4,
              n_cls=1)
    m16 = build_model("DPOT", dtype=jnp.bfloat16, **kw)
    p16 = m16.init(jax.random.key(0), jnp.zeros((1, 16, 16, 4, 2)))
    auto = RolloutServer(m16, p16, batch_buckets=(1, 2), max_wait_ms=1.0)
    f32 = RolloutServer(m16, p16, batch_buckets=(1, 2), max_wait_ms=1.0,
                        wire_dtype="float32")
    assert auto.wire_dtype == np.dtype("bfloat16")
    assert f32.wire_dtype == np.dtype(np.float32)
    auto.start()
    f32.start()
    try:
        x = np.random.default_rng(1).standard_normal(
            (2, 16, 16, 4, 2)
        ).astype(np.float32)
        a = auto.submit(x, 3)
        b = f32.submit(x, 3)
        assert a.dtype == np.float32
        np.testing.assert_array_equal(a, b)
    finally:
        auto.stop(drain=True)
        f32.stop(drain=True)

    mf = build_model("DPOT", **kw)  # f32 compute
    pf = mf.init(jax.random.key(0), jnp.zeros((1, 16, 16, 4, 2)))
    assert RolloutServer(mf, pf).wire_dtype == np.dtype(np.float32)
    with pytest.raises(ValueError):
        RolloutServer(mf, pf, wire_dtype="float16")


def test_bf16_request_body_http(served):
    """A client may POST an ml_dtypes-bfloat16 .npy (half the request
    bytes); numpy parses its descr as void-V2 and the handler reinterprets.
    The result must equal posting the same values as float32."""
    import ml_dtypes

    model, params, rs, port = served
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 16, 16, 4, 2)).astype(np.float32)
    xb = x.astype(ml_dtypes.bfloat16)
    # steps=3 is already compiled by the correctness test — this must
    # not add cache entries (test_steps_validation counts them)
    a = _post_rollout(port, xb, 3)
    b = _post_rollout(port, xb.astype(np.float32), 3)
    assert a.dtype == np.float32
    np.testing.assert_array_equal(a, b)


def test_f16_response_wire():
    """response_dtype='float16' ships fp16 predictions whose values are
    the fp16 rounding of the default f32 response (cast happens on device,
    after the full-precision rollout — the carry itself is untouched, so
    the trajectory is identical); the default stays float32."""
    from dpot_tpu.serve import RolloutServer

    kw = dict(img_size=16, patch_size=4, in_channels=2, in_timesteps=4,
              out_timesteps=1, embed_dim=32, depth=1, n_blocks=4, modes=4,
              n_cls=1)
    m = build_model("DPOT", dtype=jnp.bfloat16, **kw)
    p = m.init(jax.random.key(0), jnp.zeros((1, 16, 16, 4, 2)))
    f32 = RolloutServer(m, p, batch_buckets=(1, 2), max_wait_ms=1.0)
    f16 = RolloutServer(m, p, batch_buckets=(1, 2), max_wait_ms=1.0,
                        response_dtype="float16")
    assert f32.response_dtype == np.dtype(np.float32)
    assert f16.response_dtype == np.dtype(np.float16)
    assert f16.health()["response_dtype"] == "float16"
    f32.start()
    f16.start()
    try:
        x = np.random.default_rng(2).standard_normal(
            (2, 16, 16, 4, 2)
        ).astype(np.float32)
        a = f32.submit(x, 3)
        b = f16.submit(x, 3)
        assert a.dtype == np.float32 and b.dtype == np.float16
        np.testing.assert_array_equal(a.astype(np.float16), b)
    finally:
        f32.stop(drain=True)
        f16.stop(drain=True)

    with pytest.raises(ValueError):
        RolloutServer(m, p, response_dtype="bfloat16")


def test_microbatching_merges_concurrent_requests(served):
    model, params, rs, port = served
    rng = np.random.default_rng(1)
    xs = [rng.standard_normal((1, 16, 16, 4, 2)).astype(np.float32)
          for _ in range(3)]
    results = [None] * 3

    def call(i):
        results[i] = _post_rollout(port, xs[i], 1)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(3):
        im, _ = model.apply(params, jnp.asarray(xs[i]))
        np.testing.assert_allclose(
            results[i][..., 0, :], np.asarray(im)[..., 0, :], atol=1e-5
        )


def test_rejects_bad_rank(served):
    _, _, rs, port = served
    bad = np.zeros((16, 16), np.float32)
    with pytest.raises(Exception):
        _post_rollout(port, bad, 1)


def test_rejects_wrong_shape_and_empty_batch(served):
    """Only the batch dim may vary: a novel (H,W,T,C) would jit a FRESH
    rollout per request (a 20-40s compile over the tunnel = accidental
    DoS), and a B=0 request has nothing to run — both must 4xx before
    reaching the worker."""
    _, _, rs, port = served
    n_compiled = len(rs._rollout_cache)
    with pytest.raises(Exception, match="400"):
        _post_rollout(port, np.zeros((1, 8, 8, 4, 2), np.float32), 1)
    with pytest.raises(Exception, match="400"):
        _post_rollout(port, np.zeros((1, 16, 16, 5, 2), np.float32), 1)
    with pytest.raises(Exception, match="400"):
        _post_rollout(port, np.zeros((0, 16, 16, 4, 2), np.float32), 1)
    # warmed programs survive; the rejects traced nothing new
    assert len(rs._rollout_cache) == n_compiled


def test_oversize_request_chunks_through_buckets(served):
    """B > max bucket must run in compiled max-bucket chunks, not trace a
    fresh batch shape per request."""
    model, params, rs, port = served
    rng = np.random.default_rng(2)
    x = rng.standard_normal((9, 16, 16, 4, 2)).astype(np.float32)
    pred = _post_rollout(port, x, 1)
    assert pred.shape == (9, 16, 16, 1, 2)
    im, _ = model.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(pred[..., 0, :], np.asarray(im)[..., 0, :],
                               atol=1e-5)


def test_metrics_endpoint(served):
    model, params, rs, port = served
    # drive one request so counters move
    x = np.random.default_rng(3).standard_normal((1, 16, 16, 4, 2)).astype(np.float32)
    _post_rollout(port, x, 1)
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
        m = json.loads(r.read())
    assert m["requests"] >= 1
    assert m["batches"] >= 1
    assert m["latency_ms_avg"] > 0
    assert 0 < m["bucket_fill_rate"] <= 1
    assert m["accepting"] is True


def test_steps_validation(served):
    """steps keys the jitted-rollout cache; out-of-range values must be
    rejected (400), not compiled and cached forever."""
    model, params, rs, port = served
    x = np.zeros((1, 16, 16, 4, 2), np.float32)
    import urllib.error

    for bad in (0, -1, rs.max_steps + 1):
        try:
            _post_rollout(port, x, bad)
            raise AssertionError(f"steps={bad} was accepted")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    before = len(rs._rollout_cache)
    # a & query-string variant parses correctly via urllib.parse
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/rollout?foo=1&steps=2", method="POST",
        data=io.BytesIO(),  # placeholder, replaced below
    )
    buf = io.BytesIO()
    np.save(buf, x)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/rollout?foo=1&steps=2", data=buf.getvalue(),
        method="POST", headers={"Content-Type": "application/octet-stream"},
    )
    with urllib.request.urlopen(req) as r:
        out = np.load(io.BytesIO(r.read()))
    assert out.shape[-2] == 2
    assert len(rs._rollout_cache) == before + 1


def test_auth_token():
    """With auth_token set: /healthz open, /rollout and /metrics require
    the bearer token."""
    from dpot_tpu.serve import serve as serve_fn
    import urllib.error

    model = build_model(
        "DPOT", img_size=16, patch_size=4, in_channels=2, in_timesteps=4,
        out_timesteps=1, embed_dim=32, depth=1, n_blocks=4, modes=4, n_cls=1,
    )
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 4, 2)))
    httpd, rs = serve_fn(model, params, port=0, auth_token="sekrit",
                         batch_buckets=(1, 2), max_wait_ms=5.0)
    port = httpd.server_address[1]
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert json.loads(r.read())["ok"]
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics")
            raise AssertionError("unauthenticated /metrics accepted")
        except urllib.error.HTTPError as e:
            assert e.code == 401
        x = np.zeros((1, 16, 16, 4, 2), np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        # wrong token -> 401
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/rollout?steps=1", data=buf.getvalue(),
            method="POST", headers={"Authorization": "Bearer nope"},
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError("bad token accepted")
        except urllib.error.HTTPError as e:
            assert e.code == 401
        # right token -> 200
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/rollout?steps=1", data=buf.getvalue(),
            method="POST", headers={"Authorization": "Bearer sekrit"},
        )
        with urllib.request.urlopen(req) as r:
            out = np.load(io.BytesIO(r.read()))
        assert out.shape == (1, 16, 16, 1, 2)
        assert rs.metrics()["auth_failures"] == 2
    finally:
        httpd.shutdown()
        rs.stop()


def test_multi_model_routing():
    """serve_multi routes /rollout?model=NAME to the named server, serves
    the default on unnamed requests, and 404s unknown names. Models have
    different channel counts so a routing mistake is shape-visible."""
    from dpot_tpu.serve import RolloutServer, serve_multi
    import urllib.error

    servers = {}
    models = {}
    for name, n_ch in (("a2", 2), ("b3", 3)):
        m = build_model(
            "DPOT", img_size=16, patch_size=4, in_channels=n_ch,
            in_timesteps=4, out_timesteps=1, embed_dim=32, depth=1,
            n_blocks=4, modes=4, n_cls=1,
        )
        p = m.init(jax.random.key(0), jnp.zeros((1, 16, 16, 4, n_ch)))
        servers[name] = RolloutServer(m, p, batch_buckets=(1, 2),
                                      max_wait_ms=1.0)
        models[name] = (m, p)
    httpd, router = serve_multi(servers, default="b3", port=0)
    port = httpd.server_address[1]
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            h = json.loads(r.read())
        assert set(h["models"]) == {"a2", "b3"} and h["default"] == "b3"

        rng = np.random.default_rng(7)
        for name, n_ch in (("a2", 2), ("b3", 3)):
            x = rng.standard_normal((1, 16, 16, 4, n_ch)).astype(np.float32)
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/rollout?model={name}&steps=1",
                data=_npy(x), method="POST",
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                pred = np.load(io.BytesIO(r.read()))
            assert pred.shape == (1, 16, 16, 1, n_ch)
            m, p = models[name]
            im, _ = m.apply(p, jnp.asarray(x))
            np.testing.assert_allclose(pred[..., 0, :],
                                       np.asarray(im)[..., 0, :], atol=1e-5)

        # unnamed request -> default model (b3 expects 3 channels)
        x = rng.standard_normal((1, 16, 16, 4, 3)).astype(np.float32)
        pred = _post_rollout(port, x, 1)
        assert pred.shape == (1, 16, 16, 1, 3)

        # unknown model -> 404
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/rollout?model=nope&steps=1",
            data=_npy(x), method="POST",
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError("unknown model accepted")
        except urllib.error.HTTPError as e:
            assert e.code == 404

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
            m = json.loads(r.read())
        assert m["a2"]["requests"] >= 1 and m["b3"]["requests"] >= 2
    finally:
        httpd.shutdown()
        router.stop()


def test_single_server_rejects_model_param(served):
    """A single-model server must 404 `?model=x` rather than silently
    serving the wrong model."""
    import urllib.error

    _, _, rs, port = served
    x = np.zeros((1, 16, 16, 4, 2), np.float32)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/rollout?model=other&steps=1",
        data=_npy(x), method="POST",
    )
    try:
        urllib.request.urlopen(req)
        raise AssertionError("?model= accepted by single-model server")
    except urllib.error.HTTPError as e:
        assert e.code == 404


def _npy(a):
    buf = io.BytesIO()
    np.save(buf, a)
    return buf.getvalue()


def test_serve_cli_models_yaml(tmp_path):
    """The CLI --models fleet path end-to-end: YAML -> built models ->
    router -> routed rollouts with per-entry shapes."""
    import urllib.error

    from dpot_tpu.cli.serve import main as serve_main

    fleet = tmp_path / "fleet.yaml"
    fleet.write_text(
        "default: b\n"
        "models:\n"
        "  a: {model: DPOT, res: 16, patch_size: 4, n_channels: 2,\n"
        "      T_in: 4, T_bundle: 1, width: 32, n_layers: 1, n_blocks: 4,\n"
        "      modes: 4, train_paths: [x]}\n"
        "  b: {model: DPOT, res: 16, patch_size: 4, n_channels: 3,\n"
        "      T_in: 4, T_bundle: 1, width: 32, n_layers: 1, n_blocks: 4,\n"
        "      modes: 4, train_paths: [x]}\n"
    )
    httpd, router = serve_main(
        ["--models", str(fleet), "--port", "0"], wait=False
    )
    port = httpd.server_address[1]
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            h = json.loads(r.read())
        assert set(h["models"]) == {"a", "b"} and h["default"] == "b"
        x = np.zeros((1, 16, 16, 4, 2), np.float32)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/rollout?model=a&steps=1",
            data=_npy(x), method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            pred = np.load(io.BytesIO(r.read()))
        assert pred.shape == (1, 16, 16, 1, 2)
    finally:
        httpd.shutdown()
        router.stop(drain=True)


def test_graceful_shutdown_drains():
    """stop(drain=True) finishes queued work and rejects new submissions."""
    from dpot_tpu.serve import RolloutServer

    model = build_model(
        "DPOT", img_size=16, patch_size=4, in_channels=2, in_timesteps=4,
        out_timesteps=1, embed_dim=32, depth=1, n_blocks=4, modes=4, n_cls=1,
    )
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 4, 2)))
    rs = RolloutServer(model, params, batch_buckets=(1, 2), max_wait_ms=1.0)
    rs.start()
    x = np.zeros((1, 16, 16, 4, 2), np.float32)
    results = []
    t = threading.Thread(target=lambda: results.append(rs.submit(x, 1)))
    t.start()
    t.join(timeout=30)
    rs.stop(drain=True)
    assert len(results) == 1 and results[0].shape == (1, 16, 16, 1, 2)
    try:
        rs.submit(x, 1)
        raise AssertionError("submit accepted after shutdown")
    except RuntimeError as e:
        assert "shutting down" in str(e)
