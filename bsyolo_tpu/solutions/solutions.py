"""Solution base class (reference solutions/solutions.py BaseSolution).

Holds the model + tracker and per-frame state shared by the recipes:
track histories, region polygon utilities.
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np


class BaseSolution:
    def __init__(self, model=None, region: Optional[List[Tuple[float, float]]] = None, **kwargs):
        if isinstance(model, (str, Path)):
            # reference BaseSolution builds the facade from the cfg "model"
            # path itself (solutions/solutions.py: self.model = YOLO(...))
            from bsyolo_tpu.model import YOLO

            model = YOLO(str(model))
        self.model = model
        self.region = region
        self.track_history: Dict[int, List[Tuple[float, float]]] = defaultdict(list)
        self.kwargs = kwargs

    def extract_tracks(self, frame: np.ndarray):
        """Run track() on one frame; returns (boxes xyxy, ids, clss, confs)."""
        res = self.model.track(frame, persist=True, **self.kwargs)[0]
        if res.boxes is None or len(res.boxes) == 0 or not res.boxes.is_track:
            return (
                np.zeros((0, 4), np.float32),
                np.zeros((0,), int),
                np.zeros((0,), int),
                np.zeros((0,), np.float32),
            )
        b = res.boxes
        return b.xyxy, b.id.astype(int), b.cls.astype(int), b.conf

    def update_history(self, tid: int, center: Tuple[float, float], maxlen: int = 30):
        h = self.track_history[tid]
        h.append(center)
        if len(h) > maxlen:
            h.pop(0)
        return h

    @staticmethod
    def point_in_region(point, region) -> bool:
        """Ray-cast point-in-polygon."""
        x, y = point
        inside = False
        n = len(region)
        for i in range(n):
            x1, y1 = region[i]
            x2, y2 = region[(i + 1) % n]
            if (y1 > y) != (y2 > y):
                xin = (x2 - x1) * (y - y1) / (y2 - y1 + 1e-12) + x1
                if x < xin:
                    inside = not inside
        return inside
