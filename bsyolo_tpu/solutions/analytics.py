"""Streaming analytics charts of detection counts (reference
solutions/analytics.py).

Accumulates per-frame class counts and renders line / bar / pie / area
charts with matplotlib, returned as RGB ndarrays so callers can compose them
into video output like the reference does.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from bsyolo_tpu.solutions.solutions import BaseSolution


class Analytics(BaseSolution):
    def __init__(self, model=None, analytics_type: str = "line", max_points: int = 45, **kwargs):
        if analytics_type not in ("line", "bar", "pie", "area"):
            raise ValueError(f"unknown analytics_type: {analytics_type}")
        super().__init__(model, **kwargs)
        self.analytics_type = analytics_type
        self.max_points = max_points
        self.frames: List[int] = []
        self.totals: List[int] = []
        self.clswise: List[Dict[str, int]] = []
        self.frame_count = 0

    def update(self, frame: np.ndarray) -> Dict[str, int]:
        """Track one frame and append its class histogram."""
        boxes, ids, clss, confs = self.extract_tracks(frame)
        names = self.model.names if self.model is not None else {}
        counts: Dict[str, int] = {}
        for c in clss:
            name = names.get(int(c), str(int(c)))
            counts[name] = counts.get(name, 0) + 1
        self.frame_count += 1
        self.frames.append(self.frame_count)
        self.totals.append(len(boxes))
        self.clswise.append(counts)
        if len(self.frames) > self.max_points:
            self.frames = self.frames[-self.max_points :]
            self.totals = self.totals[-self.max_points :]
            self.clswise = self.clswise[-self.max_points :]
        return counts

    def render(self) -> np.ndarray:
        """Render the accumulated history as an RGB chart image."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6.4, 3.6), dpi=100)
        latest = self.clswise[-1] if self.clswise else {}
        if self.analytics_type == "line":
            ax.plot(self.frames, self.totals, marker="o")
            ax.set_xlabel("frame")
            ax.set_ylabel("objects")
        elif self.analytics_type == "area":
            keys = sorted({k for c in self.clswise for k in c})
            series = [[c.get(k, 0) for c in self.clswise] for k in keys]
            if keys:
                ax.stackplot(self.frames, *series, labels=keys)
                ax.legend(loc="upper left", fontsize=7)
            ax.set_xlabel("frame")
        elif self.analytics_type == "bar":
            ax.bar(list(latest.keys()), list(latest.values()))
        else:  # pie
            if latest:
                ax.pie(list(latest.values()), labels=list(latest.keys()), autopct="%1.0f%%")
        fig.tight_layout()
        fig.canvas.draw()
        img = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
        plt.close(fig)
        return img

    def process_data(self, frame: np.ndarray) -> np.ndarray:
        """One frame -> rendered chart (reference Analytics.process_data)."""
        self.update(frame)
        return self.render()
