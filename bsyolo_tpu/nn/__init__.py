"""Neural network modules, YAML graph parser, and task models (maps reference ultralytics/nn/)."""

from bsyolo_tpu.nn.parser import parse_model_yaml, load_model_yaml
from bsyolo_tpu.nn.model import DetectionGraph, build_model

__all__ = ["parse_model_yaml", "load_model_yaml", "DetectionGraph", "build_model"]
