from dpot_tpu.serve.server import RolloutServer, serve

__all__ = ["RolloutServer", "serve"]
