"""Video-analytics solutions on top of track() (maps reference ultralytics/solutions/)."""

from bsyolo_tpu.solutions.solutions import BaseSolution
from bsyolo_tpu.solutions.counter import ObjectCounter
from bsyolo_tpu.solutions.heatmap import Heatmap
from bsyolo_tpu.solutions.speed import SpeedEstimator

__all__ = ["BaseSolution", "ObjectCounter", "Heatmap", "SpeedEstimator"]
