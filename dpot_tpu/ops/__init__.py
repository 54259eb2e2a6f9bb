from dpot_tpu.ops.activations import get_activation
from dpot_tpu.ops.spectral import (
    afno_filter_2d,
    afno_filter_3d,
    afno_mode_mlp,
    spectral_resize,
)
from dpot_tpu.ops.norms import group_norm
