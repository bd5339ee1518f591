"""Tests: feature visualization, GMC, COCO converter, autobatch memory model."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

TINY = str(Path(__file__).parent / "fixtures" / "tiny.yaml")


class TestFeatureVisualization:
    def test_capture_and_plot(self, tmp_path):
        import jax.numpy as jnp

        from bsyolo_tpu.nn import build_model, load_model_yaml, parse_model_yaml
        from bsyolo_tpu.utils.visualize import capture_features, feature_visualization

        spec = parse_model_yaml(load_model_yaml(TINY))
        model, variables = build_model(spec, img_size=64)
        feats = capture_features(model, variables, jnp.zeros((1, 64, 64, 3)))
        assert feats, "no intermediates captured"
        assert any(k.startswith("m0") for k in feats)
        name, f = next(iter(feats.items()))
        out = feature_visualization(f, str(tmp_path / "f.png"), n_channels=8)
        assert Path(out).exists()


class TestGMC:
    def test_translation_estimated(self):
        from bsyolo_tpu.trackers.gmc import GMC

        rng = np.random.default_rng(0)
        base = (rng.uniform(0, 255, (120, 160)) > 127).astype(np.uint8) * 255
        import cv2

        base = cv2.GaussianBlur(base, (5, 5), 0)
        f1 = np.stack([base] * 3, -1)
        f2 = np.roll(f1, shift=6, axis=1)  # shift right by 6 px
        gmc = GMC(downscale=1)
        gmc.apply(f1)
        H = gmc.apply(f2)
        assert H[0, 2] == pytest.approx(6.0, abs=1.5)
        assert H[1, 2] == pytest.approx(0.0, abs=1.5)

    def test_warp_track_means(self):
        from bsyolo_tpu.trackers.byte_tracker import STrack
        from bsyolo_tpu.trackers.gmc import GMC

        t = STrack(np.asarray([50, 50, 10, 20, 0], np.float32), 0.9, 0)
        t.activate(STrack.shared_kalman, 1)
        H = np.asarray([[1, 0, 5], [0, 1, -3]], np.float32)
        GMC.warp_track_means([t], H)
        assert t.mean[0] == pytest.approx(55.0)
        assert t.mean[1] == pytest.approx(47.0)


class TestConverter:
    def test_coco_to_yolo(self, tmp_path):
        from bsyolo_tpu.data.converter import convert_coco

        coco = {
            "images": [{"id": 1, "file_name": "a.jpg", "width": 200, "height": 100}],
            "annotations": [
                {"id": 1, "image_id": 1, "category_id": 3, "bbox": [50, 25, 100, 50], "iscrowd": 0},
                {"id": 2, "image_id": 1, "category_id": 12, "bbox": [0, 0, 10, 10], "iscrowd": 0},
            ],
            "categories": [],
        }
        p = tmp_path / "ann.json"
        p.write_text(json.dumps(coco))
        out = convert_coco(str(p), save_dir=str(tmp_path / "yolo"))
        txt = (out / "a.txt").read_text().strip().splitlines()
        # category 3 -> class 2 (91->80 map); category 12 is a missing id -> dropped
        assert len(txt) == 1
        parts = txt[0].split()
        assert parts[0] == "2"
        assert float(parts[1]) == pytest.approx(0.5)  # cx = (50+50)/200
        assert float(parts[3]) == pytest.approx(0.5)  # w = 100/200


class TestAutobatchModel:
    def test_memory_model_math(self, monkeypatch):
        from bsyolo_tpu.utils import autobatch as ab

        monkeypatch.setattr(ab, "device_memory_bytes", lambda device=None: 16 * 1024**3)
        sizes = {1: 2 * 1024**3, 2: 3 * 1024**3}  # base 1GB + 1GB/img
        monkeypatch.setattr(ab, "compiled_memory_bytes", lambda fn, *a: sizes[a[0]])
        batch = ab.autobatch(lambda b: (b,), lambda b: None, fraction=0.6)
        # budget 9.6GB - 1GB base = 8.6 -> batch 8 (power of two)
        assert batch == 8


class TestBoTSORT:
    def test_botsort_with_gmc_keeps_identity_under_camera_pan(self):
        """A static object under a panning camera: GMC compensates so the
        track keeps its id (reference BoT-SORT behavior)."""
        import cv2

        from bsyolo_tpu.trackers import create_tracker

        t = create_tracker(str(Path(__file__).resolve().parents[1] / "bsyolo_tpu/trackers/cfg/botsort.yaml"))
        assert t.gmc is not None

        rng = np.random.default_rng(0)
        world = (rng.uniform(0, 255, (200, 320)) > 127).astype(np.uint8) * 255
        world = cv2.GaussianBlur(world, (5, 5), 0)
        world3 = np.stack([world] * 3, -1)
        ids = []
        for step in range(6):
            # camera pans right: crop window moves right, object fixed in world
            x_off = step * 8
            frame = world3[40:160, x_off : x_off + 160].copy()
            obj_x_world = 100.0
            obj_x_frame = obj_x_world - x_off
            out = t.update(
                np.asarray([[obj_x_frame, 60, 24, 24]], np.float32),
                np.asarray([0.9]),
                np.asarray([0.0]),
                img=frame,
            )
            if len(out):
                ids.append(int(out[0, 4]))
        assert len(set(ids)) == 1, f"identity switched under camera pan: {ids}"
