from dpot_tpu.serve.server import (
    ModelRouter,
    RolloutServer,
    serve,
    serve_multi,
)

__all__ = ["ModelRouter", "RolloutServer", "serve", "serve_multi"]
