"""Data pipeline: datasets, augmentation, loaders (maps reference ultralytics/data/)."""

from bsyolo_tpu.data.dataset import YOLODataset, load_dataset_yaml
from bsyolo_tpu.data.build import DataLoader

__all__ = ["YOLODataset", "load_dataset_yaml", "DataLoader"]
