"""Serving CLI: load a checkpoint and serve autoregressive rollouts.

    python -m dpot_tpu.cli.serve --model DPOT --resume_path ckpt/Ti \
        --res 128 --width 512 --n_layers 4 --port 8476

Endpoints (dpot_tpu/serve/server.py): GET /healthz, POST /rollout?steps=N
with a .npy (B, H, W, T_in, C) body -> .npy (B, H, W, N*T_bundle, C)
prediction (steps = model applications; each emits T_bundle frames).
The reference has no serving path; this is the deployment surface of the
rebuild (SURVEY.md §6 inference-latency harness, made into a service).
"""

from __future__ import annotations

import sys


def main(argv=None):
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp

    from dpot_tpu.models import build_model
    from dpot_tpu.serve import serve
    from dpot_tpu.utils.config import load_config

    argv = list(argv if argv is not None else sys.argv[1:])

    def take(flag, default, cast=str):
        if flag in argv:
            i = argv.index(flag)
            v = cast(argv[i + 1])
            del argv[i : i + 2]
            return v
        return default

    host = take("--host", "127.0.0.1")
    port = take("--port", 8476, int)
    auth_token = take("--auth_token", None)
    max_steps = take("--max_steps", 64, int)
    ssl_certfile = take("--ssl_certfile", None)
    ssl_keyfile = take("--ssl_keyfile", None)
    cfg = load_config(argv)

    model = build_model(
        cfg.model, img_size=cfg.res, patch_size=cfg.patch_size,
        in_channels=cfg.n_channels, in_timesteps=cfg.T_in,
        out_timesteps=cfg.T_bundle, embed_dim=cfg.width, modes=cfg.modes,
        depth=cfg.n_layers, n_blocks=cfg.n_blocks, mlp_ratio=cfg.mlp_ratio,
        out_layer_dim=cfg.out_layer_dim, n_cls=len(cfg.train_paths),
        normalize=cfg.normalize,
        dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32,
    )
    x0 = jnp.zeros(
        (1, cfg.res, cfg.res, cfg.T_in, cfg.n_channels), jnp.float32
    )
    params = model.init(jax.random.key(0), x0)
    if cfg.resume_path:
        from dpot_tpu.train.checkpoint import restore_params

        params = restore_params(cfg.resume_path, params)

    httpd, rs = serve(
        model, params, host=host, port=port, t_bundle=cfg.T_bundle,
        auth_token=auth_token, max_steps=max_steps,
        ssl_certfile=ssl_certfile, ssl_keyfile=ssl_keyfile,
    )
    scheme = "https" if ssl_certfile else "http"
    print(f"serving {cfg.model} ({rs.n_params/1e6:.1f}M params) "
          f"on {scheme}://{host}:{port}"
          + (" [auth required]" if auth_token else ""), flush=True)

    import signal
    import threading

    done = threading.Event()
    signal.signal(signal.SIGTERM, lambda *_: done.set())
    try:
        done.wait()
    except KeyboardInterrupt:
        pass
    # graceful: stop accepting, finish queued work, then close the listener
    print("shutting down (draining queue)...", flush=True)
    rs.stop(drain=True)
    httpd.shutdown()


if __name__ == "__main__":
    main()
