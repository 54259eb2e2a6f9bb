from dpot_tpu.models.dpot import DPOTNet
from dpot_tpu.models.registry import build_model, MODEL_PRESETS
