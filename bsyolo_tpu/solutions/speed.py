"""Track speed estimation (reference solutions/speed_estimation.py).

Pixel displacement over time mapped through a meters-per-pixel factor.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np

from bsyolo_tpu.solutions.solutions import BaseSolution


class SpeedEstimator(BaseSolution):
    def __init__(self, model=None, meters_per_pixel: float = 0.05, fps: Optional[float] = None, **kwargs):
        super().__init__(model, None, **kwargs)
        self.mpp = meters_per_pixel
        self.fps = fps  # if None, wall-clock time is used
        self.last_seen: Dict[int, tuple] = {}
        self.speeds: Dict[int, float] = {}
        self.frame_idx = 0

    def estimate_speed(self, frame: np.ndarray) -> Dict[int, float]:
        """Returns {track_id: speed km/h} for tracks visible this frame."""
        self.frame_idx += 1
        now = self.frame_idx / self.fps if self.fps else time.time()
        boxes, ids, clss, confs = self.extract_tracks(frame)
        out = {}
        for box, tid in zip(boxes, ids):
            center = np.asarray([(box[0] + box[2]) / 2, (box[1] + box[3]) / 2])
            prev = self.last_seen.get(tid)
            if prev is not None:
                (pc, pt) = prev
                dt = now - pt
                if dt > 0:
                    dist_m = np.linalg.norm(center - pc) * self.mpp
                    self.speeds[tid] = dist_m / dt * 3.6  # km/h
                    out[int(tid)] = self.speeds[tid]
            self.last_seen[tid] = (center, now)
        return out

    __call__ = estimate_speed
