from dpot_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from dpot_tpu.parallel.pipeline import pipeline_blocks
from dpot_tpu.parallel.tensor import shard_state_tp, tp_specs
