"""Workout repetition counting from pose keypoints (reference
solutions/ai_gym.py).

Per tracked person: the joint angle over three chosen keypoints (e.g.
shoulder-elbow-wrist [6, 8, 10] for push-ups) drives an up/down stage
machine; a rep is counted on the down->up transition. Thresholds match the
reference solution defaults (cfg/solutions/default.yaml: up 145, down 90).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

import numpy as np

from bsyolo_tpu.solutions.solutions import BaseSolution


def pose_angle(a, b, c) -> float:
    """Angle ABC in degrees from three (x, y) points (reference
    plotting.Annotator.estimate_pose_angle)."""
    ang = math.degrees(
        math.atan2(c[1] - b[1], c[0] - b[0]) - math.atan2(a[1] - b[1], a[0] - b[0])
    )
    ang = abs(ang)
    return 360.0 - ang if ang > 180.0 else ang


class AIGym(BaseSolution):
    def __init__(
        self,
        model=None,
        kpts: Sequence[int] = (6, 8, 10),
        up_angle: float = 145.0,
        down_angle: float = 90.0,
        **kwargs,
    ):
        super().__init__(model, **kwargs)
        self.kpts = list(kpts)
        self.up_angle = up_angle
        self.down_angle = down_angle
        self.count: Dict[int, int] = {}
        self.stage: Dict[int, str] = {}
        self.angle: Dict[int, float] = {}

    def monitor(self, frame: np.ndarray) -> Dict[int, int]:
        """One frame -> {track_id: rep count}. Needs a pose model."""
        res = self.model.track(frame, persist=True, **self.kwargs)[0]
        if res.keypoints is None or res.boxes is None or not res.boxes.is_track:
            return dict(self.count)
        kdata = res.keypoints.data  # (n, nkpt, 2|3)
        ids = res.boxes.id.astype(int)
        for tid, k in zip(ids, kdata):
            pts = [k[i][:2] for i in self.kpts]
            ang = pose_angle(*pts)
            tid = int(tid)
            self.angle[tid] = ang
            stage = self.stage.get(tid, "-")
            if ang < self.down_angle:
                if stage == "up":
                    self.count[tid] = self.count.get(tid, 0) + 1
                self.stage[tid] = "down"
            elif ang > self.up_angle:
                self.stage[tid] = "up"
        return dict(self.count)
