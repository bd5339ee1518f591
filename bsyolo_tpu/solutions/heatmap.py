"""Cumulative detection heatmap (reference solutions/heatmap.py)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from bsyolo_tpu.solutions.solutions import BaseSolution


class Heatmap(BaseSolution):
    def __init__(self, model=None, shape: Optional[tuple] = None, decay: float = 0.99, **kwargs):
        super().__init__(model, None, **kwargs)
        self.heat: Optional[np.ndarray] = np.zeros(shape, np.float32) if shape else None
        self.decay = decay

    def generate_heatmap(self, frame: np.ndarray):
        """Accumulate per-box gaussians; returns (overlay BGR, raw heat)."""
        if self.heat is None or self.heat.shape != frame.shape[:2]:
            self.heat = np.zeros(frame.shape[:2], np.float32)
        self.heat *= self.decay
        boxes, ids, clss, confs = self.extract_tracks(frame)
        h, w = self.heat.shape
        for box in boxes:
            x1, y1, x2, y2 = (int(v) for v in box)
            x1, y1 = max(0, x1), max(0, y1)
            x2, y2 = min(w, x2), min(h, y2)
            if x2 <= x1 or y2 <= y1:
                continue
            yy, xx = np.mgrid[y1:y2, x1:x2]
            cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
            sx, sy = max((x2 - x1) / 4, 1), max((y2 - y1) / 4, 1)
            self.heat[y1:y2, x1:x2] += np.exp(
                -(((xx - cx) / sx) ** 2 + ((yy - cy) / sy) ** 2) / 2
            )
        overlay = self.render(frame)
        return overlay, self.heat

    def render(self, frame: np.ndarray) -> np.ndarray:
        import cv2

        norm = self.heat / (self.heat.max() + 1e-9)
        colored = cv2.applyColorMap((norm * 255).astype(np.uint8), cv2.COLORMAP_JET)
        return cv2.addWeighted(frame, 0.5, colored, 0.5, 0)

    __call__ = generate_heatmap
