"""Live per-region object counting (reference solutions/region_counter.py).

Multiple named polygon regions; each frame reports how many tracked objects
are currently inside each region.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from bsyolo_tpu.solutions.solutions import BaseSolution


class RegionCounter(BaseSolution):
    def __init__(
        self,
        model=None,
        regions: Optional[Dict[str, List[Tuple[float, float]]]] = None,
        **kwargs,
    ):
        super().__init__(model, **kwargs)
        self.regions = regions or {
            "Region#01": [(150, 150), (1130, 150), (1130, 570), (150, 570)]
        }
        self.region_counts: Dict[str, int] = {k: 0 for k in self.regions}

    def add_region(self, name: str, polygon: List[Tuple[float, float]]):
        self.regions[name] = polygon
        self.region_counts[name] = 0

    def count(self, frame: np.ndarray) -> Dict[str, int]:
        """One frame -> {region name: live count inside}."""
        boxes, ids, clss, confs = self.extract_tracks(frame)
        centers = [((b[0] + b[2]) / 2, (b[1] + b[3]) / 2) for b in boxes]
        self.region_counts = {
            name: sum(self.point_in_region(c, poly) for c in centers)
            for name, poly in self.regions.items()
        }
        return dict(self.region_counts)
