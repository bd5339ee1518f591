"""Zone-restricted tracking (reference solutions/trackzone.py).

Masks each frame to the zone polygon before detection so only objects inside
the zone are detected/tracked (reference trackzone.py:55 bitwise_and mask).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from bsyolo_tpu.solutions.solutions import BaseSolution


class TrackZone(BaseSolution):
    def __init__(self, model=None, region: Optional[List[Tuple[int, int]]] = None, **kwargs):
        import cv2

        super().__init__(model, **kwargs)
        default_region = [(150, 150), (1130, 150), (1130, 570), (150, 570)]
        self.region = cv2.convexHull(np.asarray(region or default_region, np.int32))

    def trackzone(self, frame: np.ndarray):
        """One frame -> (boxes xyxy, track ids, classes, confs) inside the zone."""
        import cv2

        mask = cv2.fillPoly(np.zeros(frame.shape[:2], np.uint8), [self.region], 255)
        masked = cv2.bitwise_and(frame, frame, mask=mask)
        return self.extract_tracks(masked)
