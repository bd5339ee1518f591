"""Line/region object counting (reference solutions/object_counter.py).

Counts tracks crossing a line (in/out by side change) or entering a polygon
region. Per-class tallies like the reference.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from bsyolo_tpu.solutions.solutions import BaseSolution


class ObjectCounter(BaseSolution):
    def __init__(self, model=None, region: Optional[List[Tuple[float, float]]] = None, **kwargs):
        super().__init__(model, region, **kwargs)
        self.in_count = 0
        self.out_count = 0
        self.classwise: Dict[int, Dict[str, int]] = {}
        self.counted: Dict[int, int] = {}  # track_id -> last side / in-region flag

    def _line_side(self, p) -> int:
        (x1, y1), (x2, y2) = self.region[0], self.region[1]
        v = (x2 - x1) * (p[1] - y1) - (y2 - y1) * (p[0] - x1)
        return 1 if v > 0 else -1

    def count(self, frame: np.ndarray):
        """Process one frame; returns dict with running counts."""
        boxes, ids, clss, confs = self.extract_tracks(frame)
        for box, tid, c in zip(boxes, ids, clss):
            center = ((box[0] + box[2]) / 2, (box[1] + box[3]) / 2)
            self.update_history(tid, center)
            cw = self.classwise.setdefault(int(c), {"in": 0, "out": 0})
            if len(self.region) == 2:  # line crossing
                side = self._line_side(center)
                prev = self.counted.get(tid)
                if prev is not None and side != prev:
                    if side > prev:
                        self.in_count += 1
                        cw["in"] += 1
                    else:
                        self.out_count += 1
                        cw["out"] += 1
                self.counted[tid] = side
            else:  # polygon region entry
                inside = self.point_in_region(center, self.region)
                prev = self.counted.get(tid, 0)
                if inside and not prev:
                    self.in_count += 1
                    cw["in"] += 1
                elif not inside and prev:
                    self.out_count += 1
                    cw["out"] += 1
                self.counted[tid] = int(inside)
        return {"in": self.in_count, "out": self.out_count, "classwise": self.classwise}

    __call__ = count
