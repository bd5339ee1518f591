"""Application-layer tests: GRFB-UNet, violation rules, dwell timer, pipeline."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))


class TestViolationRule:
    def test_occlusion_ratio(self):
        from bsyolo_tpu.app import occlusion_ratio

        bg = np.zeros((100, 100), np.uint8)
        bg[40:60, 0:100] = 255  # tactile paving strip in background
        live_clear = bg.copy()  # nothing occluded
        assert occlusion_ratio((10, 30, 50, 70), live_clear, bg) == pytest.approx(0.0)
        live_blocked = np.zeros((100, 100), np.uint8)  # car covers everything
        assert occlusion_ratio((10, 30, 50, 70), live_blocked, bg) == pytest.approx(1.0)
        # half the strip visible
        live_half = bg.copy()
        live_half[40:50, :] = 0
        r = occlusion_ratio((10, 30, 50, 70), live_half, bg)
        assert r == pytest.approx(0.5, abs=0.01)

    def test_violation_threshold(self):
        from bsyolo_tpu.app import is_parking_violation

        bg = np.zeros((100, 100), np.uint8)
        bg[40:60, :] = 255
        live = np.zeros((100, 100), np.uint8)
        v, box = is_parking_violation((30, 50, 40, 40), live, bg)
        assert v and box == (10, 30, 50, 70)
        v2, _ = is_parking_violation((30, 50, 40, 40), bg, bg)  # nothing occluded
        assert not v2

    def test_box_outside_paving_is_not_violation(self):
        from bsyolo_tpu.app import is_parking_violation

        bg = np.zeros((100, 100), np.uint8)
        bg[80:90, :] = 255
        live = np.zeros((100, 100), np.uint8)
        v, _ = is_parking_violation((20, 20, 20, 20), live, bg)
        assert not v  # background has no paving inside the box -> ratio 0


class TestVehicleTimer:
    def test_dwell_and_reset_on_motion(self):
        from bsyolo_tpu.app import VehicleTimer

        t = [0.0]
        timer = VehicleTimer(violation_threshold=10.0, iou_threshold=0.7, clock=lambda: t[0])
        box = (10, 10, 50, 50)
        assert timer.update(1, box) == (0.0, False)  # starts the clock
        t[0] = 5.0
        _, violated = timer.update(1, box)
        assert not violated
        t[0] = 11.0
        elapsed, violated = timer.update(1, box)
        assert violated and elapsed == pytest.approx(11.0)
        # car moves -> timer restarts
        t[0] = 12.0
        moved = (200, 200, 240, 240)
        _, violated = timer.update(1, moved)
        assert not violated
        t[0] = 21.0
        _, violated = timer.update(1, moved)
        assert not violated  # only 9s since reset
        t[0] = 22.5
        elapsed, violated = timer.update(1, moved)
        assert violated


class TestGRFBUNet:
    def test_forward_shapes(self):
        import jax
        import jax.numpy as jnp

        from bsyolo_tpu.app.grfb_unet import GRFBUNet

        model = GRFBUNet(num_classes=2, base_c=16)
        variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
        )
        out = jax.jit(lambda v, x: model.apply(v, x, train=False))(
            variables, jnp.zeros((1, 64, 64, 3))
        )
        assert out.shape == (1, 64, 64, 2)

    def test_segmenter_mask(self):
        from bsyolo_tpu.app.grfb_unet import BlindwaySegmenter

        seg = BlindwaySegmenter(base_c=8, resize=64)
        frame = np.random.default_rng(0).integers(0, 255, (96, 128, 3)).astype(np.uint8)
        mask = seg(frame)
        assert mask.shape == (96, 128)
        assert set(np.unique(mask)) <= {0, 255}


class TestPipeline:
    def test_end_to_end_violation_detection(self, tmp_path):
        """Full pipeline on a synthetic scene: a 'car' square parked on a
        painted 'paving' strip must be flagged; a car off the strip must not."""
        import cv2

        from bsyolo_tpu import YOLO
        from bsyolo_tpu.app import ParkingViolationPipeline
        from bsyolo_tpu.app.grfb_unet import BlindwaySegmenter

        # deterministic stub segmenter: "paving" = bright yellow pixels
        class StubSegmenter(BlindwaySegmenter):
            def __init__(self):
                pass

            def __call__(self, frame):
                yellow = (frame[..., 2] > 180) & (frame[..., 1] > 180) & (frame[..., 0] < 120)
                return yellow.astype(np.uint8) * 255

        size = 200

        def scene(car_x=None):
            img = np.full((size, size, 3), 60, np.uint8)
            img[90:120, :] = [40, 220, 230]  # yellow paving strip (BGR)
            if car_x is not None:
                img[85:130, car_x : car_x + 50] = [200, 190, 185]  # bright car
            return img

        # stub detector: always reports the car box with a stable track id —
        # the pipeline orchestration (segment -> occlusion -> timer -> render)
        # is what's under test; detector/tracker have their own tests
        class StubDetector:
            names = {0: "car"}

            def track(self, frame, **kw):
                from bsyolo_tpu.engine.results import Results

                boxes = np.asarray([[75.0, 85.0, 125.0, 130.0, 1.0, 0.9, 0.0]], np.float32)
                return [Results(frame, "frame", self.names, boxes=boxes)]

        t = [0.0]
        pipe = ParkingViolationPipeline(
            StubDetector(),
            StubSegmenter(),
            occlusion_threshold=0.7,
            dwell_seconds=5.0,
            conf=0.00001,
            clock=lambda: t[0],
        )
        pipe.prepare_background(scene(car_x=None))
        assert pipe.background_mask[100, 100] == 255

        events = []
        for i in range(6):
            t[0] = i * 2.0  # 2 simulated seconds per frame
            ev = pipe.process_frame(scene(car_x=75), frame_idx=i, out_dir=tmp_path)
            events.append(ev)
        # the stub paving is fully occluded by the car box -> violations flagged
        flagged = [e for e in events if e["violations"]]
        assert flagged, "no violations flagged on an occluding car"
        # dwell violation should appear once simulated time passes 5s
        long_flags = [v for e in events for v in e["violations"] if v["long"]]
        assert long_flags, "dwell-time violation never triggered"
        assert any(tmp_path.glob("violation_frame_*.jpg"))


class TestCLI:
    def test_help_version_cfg(self, capsys):
        from bsyolo_tpu.cli import main

        assert main(["help"]) == 0
        assert "TASK MODE" in capsys.readouterr().out
        assert main(["version"]) == 0
        assert main(["cfg"]) == 0
        assert "nwdloss" in capsys.readouterr().out

    def test_bad_key_and_missing_mode(self):
        import pytest as _pytest

        from bsyolo_tpu.cli import main

        with _pytest.raises(SyntaxError):
            main(["train", "epochz=3"])
        with _pytest.raises(SyntaxError):
            main(["detect"])  # no mode

    def test_cli_predict(self, tmp_path, capsys):
        import cv2

        from bsyolo_tpu.cli import main

        img = np.full((120, 120, 3), 50, np.uint8)
        img[30:80, 30:80] = 220
        cv2.imwrite(str(tmp_path / "x.jpg"), img)
        rc = main(
            [
                "predict",
                f"model={Path(__file__).parent / 'fixtures' / 'tiny.yaml'}",
                f"source={tmp_path / 'x.jpg'}",
                "conf=0.0001",
                f"project={tmp_path / 'runs'}",
                "name=p",
                "imgsz=96",
            ]
        )
        assert rc == 0
        assert (tmp_path / "runs" / "p" / "x.jpg").exists()


class TestCLIVerbs:
    """settings / copy-cfg / solutions verbs (reference cfg/__init__.py:580-680)."""

    def test_settings_view_update_reset(self, tmp_path, capsys, monkeypatch):
        monkeypatch.setenv("HOME", str(tmp_path))
        from bsyolo_tpu.cli import main

        assert main(["settings"]) == 0
        out = capsys.readouterr().out
        assert "datasets_dir" in out
        assert main(["settings", f"datasets_dir={tmp_path / 'ds'}"]) == 0
        assert str(tmp_path / "ds") in capsys.readouterr().out
        assert main(["settings", "reset"]) == 0
        assert str(tmp_path / "ds") not in capsys.readouterr().out

    def test_copy_cfg(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from bsyolo_tpu.cli import main

        assert main(["copy-cfg"]) == 0
        assert (tmp_path / "default_copy.yaml").exists()

    def test_solutions_count(self, tmp_path):
        import cv2

        from bsyolo_tpu.cli import main

        img = np.full((96, 96, 3), 40, np.uint8)
        img[20:70, 20:70] = 220
        cv2.imwrite(str(tmp_path / "a.jpg"), img)
        cv2.imwrite(str(tmp_path / "b.jpg"), img)
        rc = main([
            "solutions", "count",
            f"model={Path(__file__).parent / 'fixtures' / 'tiny.yaml'}",
            f"source={tmp_path}", "conf=0.0001", "imgsz=96",
        ])
        assert rc == 0

    def test_solutions_heatmap_no_region(self, tmp_path):
        """heatmap/speed pin their own region; the verb must not crash."""
        import cv2

        from bsyolo_tpu.cli import main

        img = np.full((96, 96, 3), 60, np.uint8)
        cv2.imwrite(str(tmp_path / "a.jpg"), img)
        rc = main([
            "solutions", "heatmap",
            f"model={Path(__file__).parent / 'fixtures' / 'tiny.yaml'}",
            f"source={tmp_path}", "conf=0.0001", "imgsz=96",
        ])
        assert rc == 0

    def test_settings_rejects_unknown_key(self, tmp_path, monkeypatch):
        monkeypatch.setenv("HOME", str(tmp_path))
        import pytest as _pytest

        from bsyolo_tpu.cli import main

        with _pytest.raises(SyntaxError):
            main(["settings", "datasets_dri=/data"])

    def test_solutions_unknown_name(self):
        import pytest as _pytest

        from bsyolo_tpu.cli import main

        with _pytest.raises(SyntaxError):
            main(["solutions", "nosuch", "source=x"])


class TestCLINewFlags:
    def test_cli_predict_with_round3_flags(self, tmp_path):
        """The round-3 arg surface flows through the CLI k=v parser:
        augment (TTA), half, visualize, show_conf toggles."""
        import cv2

        from bsyolo_tpu.cli import main

        img = np.full((120, 120, 3), 50, np.uint8)
        img[30:80, 30:80] = 220
        cv2.imwrite(str(tmp_path / "x.jpg"), img)
        rc = main(
            [
                "predict",
                f"model={Path(__file__).parent / 'fixtures' / 'tiny.yaml'}",
                f"source={tmp_path / 'x.jpg'}",
                "conf=0.0001", "imgsz=96", "augment=True", "half=True",
                "show_conf=False", "visualize=True",
                f"project={tmp_path / 'runs'}", "name=p",
            ]
        )
        assert rc == 0
        assert (tmp_path / "runs" / "p" / "x.jpg").exists()
        assert list((tmp_path / "runs" / "p" / "features").glob("*.png"))
