"""Solutions tests with a stub tracked detector (deterministic motion)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))


class StubModel:
    """Emits one track (id=1) moving left->right along y=50, plus a static
    second track (id=2) at (150, 150)."""

    names = {0: "car"}

    def __init__(self):
        self.t = 0

    def track(self, frame, **kw):
        from bsyolo_tpu.engine.results import Results

        x = 10 + self.t * 20
        self.t += 1
        boxes = np.asarray(
            [
                [x, 40, x + 20, 60, 1.0, 0.9, 0.0],
                [140, 140, 160, 160, 2.0, 0.8, 0.0],
            ],
            np.float32,
        )
        return [Results(frame, "frame", self.names, boxes=boxes)]


def frame():
    return np.zeros((200, 200, 3), np.uint8)


class TestCounter:
    def test_line_crossing_counts_once(self):
        from bsyolo_tpu.solutions import ObjectCounter

        counter = ObjectCounter(StubModel(), region=[(100, 0), (100, 200)])
        for _ in range(8):  # moving track crosses x=100 once
            stats = counter.count(frame())
        assert stats["in"] + stats["out"] == 1  # one crossing, one direction
        cw = stats["classwise"][0]
        assert cw["in"] + cw["out"] == 1

    def test_region_entry(self):
        from bsyolo_tpu.solutions import ObjectCounter

        region = [(120, 120), (180, 120), (180, 180), (120, 180)]
        counter = ObjectCounter(StubModel(), region=region)
        for _ in range(3):
            stats = counter.count(frame())
        # static track 2 sits inside the region from the first frame
        assert stats["in"] == 1


class TestHeatmap:
    def test_accumulates_and_renders(self):
        from bsyolo_tpu.solutions import Heatmap

        hm = Heatmap(StubModel())
        overlay, heat = hm(frame())
        overlay, heat = hm(frame())
        assert overlay.shape == (200, 200, 3)
        assert heat[150, 150] > 0  # static box heats its region
        assert heat.max() > heat.mean() * 5


class TestSpeed:
    def test_constant_speed(self):
        from bsyolo_tpu.solutions import SpeedEstimator

        est = SpeedEstimator(StubModel(), meters_per_pixel=0.1, fps=10.0)
        speeds = {}
        for _ in range(4):
            speeds = est(frame())
        # 20 px/frame * 0.1 m/px * 10 f/s = 20 m/s = 72 km/h
        assert speeds[1] == pytest.approx(72.0, rel=0.01)
        assert speeds[2] == pytest.approx(0.0, abs=1e-6)


class TestPlotting:
    def test_plot_results_and_images(self, tmp_path, rng):
        from bsyolo_tpu.utils.plotting import plot_images, plot_results

        csv_path = tmp_path / "results.csv"
        csv_path.write_text(
            "epoch,loss,box_loss,fitness\n0,50.0,2.0,0.0\n1,30.0,1.5,0.2\n2,20.0,1.0,0.4\n"
        )
        out = plot_results(csv_path)
        assert Path(out).exists()

        batch = {
            "img": rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32),
            "bboxes": np.tile(np.asarray([[0.5, 0.5, 0.4, 0.3]], np.float32), (4, 2, 1)),
            "cls": np.zeros((4, 2), np.int32),
            "mask": np.ones((4, 2), np.float32),
        }
        canvas = plot_images(batch, {0: "car"}, save_path=tmp_path / "mosaic.jpg")
        assert canvas.shape == (128, 128, 3)
        assert (tmp_path / "mosaic.jpg").exists()


class TestTunerMutation:
    def test_mutation_respects_bounds(self):
        from bsyolo_tpu.engine.tuner import DEFAULT_SPACE, Tuner

        t = Tuner({"model": "x", "data": "y", "epochs": 1})
        parent = {k: (lo + hi) / 2 for k, (lo, hi, _) in DEFAULT_SPACE.items()}
        for _ in range(20):
            hyp = t._mutate(parent)
            for k, (lo, hi, _) in DEFAULT_SPACE.items():
                assert lo <= hyp[k] <= hi
        assert any(t._mutate(parent) != t._mutate(parent) for _ in range(3))
