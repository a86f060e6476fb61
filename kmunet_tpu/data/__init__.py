from kmunet_tpu.data.shanghai import ShanghaiDataset, split_indices, PIXEL_SCALE, THRESHOLDS
from kmunet_tpu.data.laps import LAPSDataset
from kmunet_tpu.data.synthetic import SyntheticNowcastDataset
from kmunet_tpu.data.pipeline import DataLoader

__all__ = [
    "ShanghaiDataset",
    "LAPSDataset",
    "SyntheticNowcastDataset",
    "DataLoader",
    "split_indices",
    "PIXEL_SCALE",
    "THRESHOLDS",
]
