from dpot_tpu.data.registry import DATASET_DICT, DatasetSpec, register_dataset
from dpot_tpu.data.grid_dataset import MixedTemporalDataset, TemporalDataset3D
from dpot_tpu.data.loader import DataLoader
