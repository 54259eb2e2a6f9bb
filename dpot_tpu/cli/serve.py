"""Serving CLI: load checkpoint(s) and serve autoregressive rollouts.

Single model:

    python -m dpot_tpu.cli.serve --model DPOT --resume_path ckpt/Ti \
        --res 128 --width 512 --n_layers 4 --port 8476

Multi-model (one process, one device, N models; requests route by
`?model=name`):

    python -m dpot_tpu.cli.serve --models fleet.yaml --port 8476

where fleet.yaml is
    default: ti
    models:
      ti: {model: DPOT, res: 128, width: 512, n_layers: 4,
           resume_path: ckpt/Ti}
      s:  {model: DPOT, res: 128, width: 1024, n_layers: 6,
           resume_path: ckpt/S}
(each entry takes any TrainConfig field).

Endpoints (dpot_tpu/serve/server.py): GET /healthz, GET /metrics,
POST /rollout?steps=N[&model=NAME] with a .npy (B, H, W, T_in, C) body ->
.npy (B, H, W, N*T_bundle, C) prediction (steps = model applications; each
emits T_bundle frames). The reference has no serving path; this is the
deployment surface of the rebuild (SURVEY.md §6 inference-latency harness,
made into a service).
"""

from __future__ import annotations

import dataclasses
import sys


def _build_served(cfg):
    """Build (model, params) for one TrainConfig, restoring its checkpoint."""
    import jax
    import jax.numpy as jnp

    from dpot_tpu.models import build_model

    model = build_model(
        cfg.model, img_size=cfg.res, patch_size=cfg.patch_size,
        in_channels=cfg.n_channels, in_timesteps=cfg.T_in,
        out_timesteps=cfg.T_bundle, embed_dim=cfg.width, modes=cfg.modes,
        depth=cfg.n_layers, n_blocks=cfg.n_blocks, mlp_ratio=cfg.mlp_ratio,
        out_layer_dim=cfg.out_layer_dim, n_cls=len(cfg.train_paths),
        # act/use_ln MUST match training: restore_params re-imposes the
        # template treedef, so an activation mismatch is undetectable from
        # the params and would serve silently wrong predictions
        act=cfg.act, normalize=cfg.normalize, use_ln=cfg.use_ln,
        dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32,
    )
    x0 = jnp.zeros(
        (1, cfg.res, cfg.res, cfg.T_in, cfg.n_channels), jnp.float32
    )
    params = model.init(jax.random.key(0), x0)
    if cfg.resume_path:
        from dpot_tpu.train.checkpoint import restore_params

        params = restore_params(cfg.resume_path, params)
    return model, params


def main(argv=None, wait=True):
    """wait=False skips the signal loop and returns (httpd, server) —
    the in-process test hook; production callers block until SIGTERM."""
    sys.path.insert(0, ".")

    from dpot_tpu.utils.config import TrainConfig, load_config

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
    # H2D wire format for request tensors (serve/server.py wire_dtype):
    # auto = bf16 when the model computes bf16 (bit-identical, half the
    # host->device bytes), float32/bfloat16 to force
    wire_dtype = take("--wire_dtype", "auto")
    # response wire: float16 halves D2H + HTTP response bytes (opt-in;
    # default keeps the float32 response contract)
    response_dtype = take("--response_dtype", "float32")
    models_yaml = take("--models", None)

    if models_yaml:
        import yaml

        from dpot_tpu.serve import RolloutServer, serve_multi

        if argv:
            raise SystemExit(
                f"--models mode takes its per-model config from the YAML; "
                f"unexpected extra CLI flags: {argv}"
            )
        with open(models_yaml) as f:
            spec = yaml.safe_load(f)
        if not isinstance(spec, dict) or not isinstance(
            spec.get("models"), dict
        ) or not spec["models"]:
            raise SystemExit(
                f"fleet YAML {models_yaml!r} must contain a non-empty "
                "'models:' mapping (see cli/serve.py docstring)"
            )
        fields = {f.name for f in dataclasses.fields(TrainConfig)}
        servers = {}
        for name, entry in spec["models"].items():
            unknown = set(entry) - fields
            if unknown:
                raise SystemExit(
                    f"model {name!r}: unknown config keys {sorted(unknown)} "
                    "(misspelled TrainConfig field?)"
                )
            cfg = TrainConfig(**entry)
            model, params = _build_served(cfg)
            servers[name] = RolloutServer(
                model, params, t_bundle=cfg.T_bundle, max_steps=max_steps,
                wire_dtype=wire_dtype, response_dtype=response_dtype,
            )
        httpd, router = serve_multi(
            servers, default=spec.get("default"), auth_token=auth_token,
            host=host, port=port, ssl_certfile=ssl_certfile,
            ssl_keyfile=ssl_keyfile,
        )
        rs = router
        desc = (f"{len(servers)} models ({', '.join(sorted(servers))}; "
                f"default={router.default})")
    else:
        from dpot_tpu.serve import serve

        cfg = load_config(argv)
        model, params = _build_served(cfg)
        httpd, rs = serve(
            model, params, host=host, port=port, t_bundle=cfg.T_bundle,
            auth_token=auth_token, max_steps=max_steps,
            wire_dtype=wire_dtype, response_dtype=response_dtype,
            ssl_certfile=ssl_certfile, ssl_keyfile=ssl_keyfile,
        )
        desc = f"{cfg.model} ({rs.n_params/1e6:.1f}M params)"

    scheme = "https" if ssl_certfile else "http"
    print(f"serving {desc} on {scheme}://{host}:{port}"
          + (" [auth required]" if auth_token else ""), flush=True)

    if not wait:
        return httpd, rs

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
