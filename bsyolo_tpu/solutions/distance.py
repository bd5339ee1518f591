"""Distance measurement between two tracked objects (reference
solutions/distance_calculation.py).

The reference selects the two objects with mouse clicks; here selection is
programmatic (``select(track_id)``), which the GUI wrapper can drive from a
cv2 mouse callback. Distance is centroid euclidean distance in pixels
(reference distance_calculation.py:114).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import numpy as np

from bsyolo_tpu.solutions.solutions import BaseSolution


class DistanceCalculation(BaseSolution):
    def __init__(self, model=None, **kwargs):
        super().__init__(model, **kwargs)
        self.selected: Dict[int, np.ndarray] = {}

    def select(self, track_id: int):
        """Mark a track for measurement (at most two; third resets)."""
        if len(self.selected) >= 2 and track_id not in self.selected:
            self.selected = {}
        self.selected[track_id] = None

    def reset(self):
        self.selected = {}

    def calculate(self, frame: np.ndarray) -> Optional[float]:
        """One frame -> pixel distance between the two selected tracks'
        centroids, or None until both are selected and visible."""
        boxes, ids, clss, confs = self.extract_tracks(frame)
        for box, tid in zip(boxes, ids):
            if int(tid) in self.selected:
                self.selected[int(tid)] = box
        live = [b for b in self.selected.values() if b is not None]
        if len(live) != 2:
            return None
        (x1, y1), (x2, y2) = (
            ((b[0] + b[2]) / 2, (b[1] + b[3]) / 2) for b in live
        )
        return math.sqrt((x1 - x2) ** 2 + (y1 - y2) ** 2)
