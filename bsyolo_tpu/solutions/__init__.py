"""Video-analytics solutions on top of track() (maps reference ultralytics/solutions/)."""

from bsyolo_tpu.solutions.solutions import BaseSolution
from bsyolo_tpu.solutions.counter import ObjectCounter
from bsyolo_tpu.solutions.heatmap import Heatmap
from bsyolo_tpu.solutions.speed import SpeedEstimator
from bsyolo_tpu.solutions.parking import ParkingManagement, ParkingPtsSelection, save_regions_json
from bsyolo_tpu.solutions.queue import QueueManager
from bsyolo_tpu.solutions.region_counter import RegionCounter
from bsyolo_tpu.solutions.trackzone import TrackZone
from bsyolo_tpu.solutions.distance import DistanceCalculation
from bsyolo_tpu.solutions.security import SecurityAlarm
from bsyolo_tpu.solutions.ai_gym import AIGym
from bsyolo_tpu.solutions.analytics import Analytics

__all__ = [
    "BaseSolution",
    "ObjectCounter",
    "Heatmap",
    "SpeedEstimator",
    "ParkingManagement",
    "ParkingPtsSelection",
    "save_regions_json",
    "QueueManager",
    "RegionCounter",
    "TrackZone",
    "DistanceCalculation",
    "SecurityAlarm",
    "AIGym",
    "Analytics",
]
