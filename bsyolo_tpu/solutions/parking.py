"""Parking lot management (reference solutions/parking_management.py).

Per-frame occupancy of JSON-defined parking regions: a region is occupied
when any detected vehicle's box center falls inside its polygon (reference
process_data, parking_management.py:~180 pointPolygonTest loop).
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

import numpy as np

from bsyolo_tpu.solutions.solutions import BaseSolution


def save_regions_json(regions: List[List[List[int]]], path: str) -> None:
    """Persist parking regions as the reference JSON schema:
    [{"points": [[x, y], ...]}, ...] (what ParkingPtsSelection writes)."""
    with open(path, "w") as f:
        json.dump([{"points": [list(map(int, p)) for p in r]} for r in regions], f)


# Interactive region annotation lives in parking_select.py; re-exported here
# so the reference's import location (solutions.parking_management namespace)
# maps 1:1.
from bsyolo_tpu.solutions.parking_select import (  # noqa: F401,E402
    ParkingPtsSelection,
    RegionSelectionCore,
)


class ParkingManagement(BaseSolution):
    """Occupancy tracking over JSON parking regions."""

    def __init__(self, model=None, json_file: Optional[str] = None, **kwargs):
        super().__init__(model, **kwargs)
        if json_file is None:
            raise ValueError("json_file with parking region points is required")
        with open(json_file) as f:
            self.regions = json.load(f)
        self.pr_info: Dict[str, int] = {"Occupancy": 0, "Available": 0}

    def process(self, frame: np.ndarray, annotate: bool = False) -> Dict[str, int]:
        """One frame -> {"Occupancy": n, "Available": m}; optionally draws
        regions (green=occupied, red=available, reference colors inverted to
        the conventional reading) onto ``frame`` in place."""
        boxes, ids, clss, confs = self.extract_tracks(frame)
        centers = [((b[0] + b[2]) / 2, (b[1] + b[3]) / 2) for b in boxes]
        occupied = 0
        states = []
        for region in self.regions:
            pts = region["points"]
            occ = any(self.point_in_region(c, pts) for c in centers)
            occupied += occ
            states.append(occ)
        self.pr_info = {"Occupancy": occupied, "Available": len(self.regions) - occupied}
        if annotate:
            import cv2

            for region, occ in zip(self.regions, states):
                pts = np.asarray(region["points"], np.int32).reshape(-1, 1, 2)
                color = (0, 255, 0) if occ else (0, 0, 255)
                cv2.polylines(frame, [pts], True, color, 2)
            cv2.putText(
                frame,
                f"Occupancy: {self.pr_info['Occupancy']}  Available: {self.pr_info['Available']}",
                (10, 30),
                cv2.FONT_HERSHEY_SIMPLEX,
                0.8,
                (255, 255, 255),
                2,
            )
        return dict(self.pr_info)
