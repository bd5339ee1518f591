"""Queue length monitoring (reference solutions/queue_management.py).

Counts tracked objects currently inside the queue polygon. Like the
reference (queue_management.py process_queue), an object only counts once it
has track history (prev position exists) — a brand-new track in the region
on its first frame is not yet a queue member.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from bsyolo_tpu.solutions.solutions import BaseSolution


class QueueManager(BaseSolution):
    def __init__(self, model=None, region: Optional[List[Tuple[float, float]]] = None, **kwargs):
        super().__init__(model, region or [(20, 60), (620, 60), (620, 420), (20, 420)], **kwargs)
        self.counts = 0

    def process_queue(self, frame: np.ndarray) -> int:
        """One frame -> current queue count (resets every frame)."""
        self.counts = 0
        boxes, ids, clss, confs = self.extract_tracks(frame)
        for box, tid in zip(boxes, ids):
            center = ((box[0] + box[2]) / 2, (box[1] + box[3]) / 2)
            hist = self.update_history(tid, center)
            has_prev = len(hist) > 1
            if has_prev and len(self.region) >= 3 and self.point_in_region(center, self.region):
                self.counts += 1
        return self.counts
