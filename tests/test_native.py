"""Native C++ library: build, golden parity vs Python implementations,
and the standalone C++ client end-to-end."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import ref_oracle

NATIVE = Path(__file__).resolve().parents[1] / "native"


@pytest.fixture(scope="module")
def native():
    from bsyolo_tpu.utils import native as N

    N.build_native()
    return N


class TestNativeLetterbox:
    def test_matches_python_letterbox(self, native, rng):
        from bsyolo_tpu.ops.letterbox import letterbox_image

        img = rng.integers(0, 255, (317, 423, 3)).astype(np.uint8)
        ref, r_ref, _ = letterbox_image(img, (640, 640))
        got, r = native.letterbox(img, (640, 640))
        assert got.shape == ref.shape
        assert r == pytest.approx(r_ref, rel=1e-6)
        # bilinear rounding differs from cv2 fixed-point by at most 1 LSB
        diff = np.abs(got.astype(int) - ref.astype(int))
        assert diff.max() <= 2
        assert (diff > 0).mean() < 0.35

    def test_identity_scale(self, native, rng):
        img = rng.integers(0, 255, (320, 640, 3)).astype(np.uint8)
        got, r = native.letterbox(img, (640, 640))
        assert r == pytest.approx(1.0)
        np.testing.assert_array_equal(got[160:480], img)  # no resampling needed
        assert (got[:160] == 114).all() and (got[480:] == 114).all()


class TestNativeNMS:
    def test_matches_numpy_oracle(self, native):
        # local generator: the shared session rng's draw position depends on
        # test order, and boxes whose IoU straddles the threshold within f32
        # rounding make the comparison order-sensitive
        rng = np.random.default_rng(42)
        n, nc = 120, 5
        cx = rng.uniform(50, 500, n)
        cy = rng.uniform(50, 500, n)
        w = rng.uniform(10, 80, n)
        h = rng.uniform(10, 80, n)
        scores = rng.uniform(0, 1, (n, nc)).astype(np.float32)
        preds = np.concatenate([np.stack([cx, cy, w, h], -1), scores], -1).astype(np.float32)
        out = native.nms(preds, conf_thres=0.5, iou_thres=0.5)
        # oracle: per-class greedy on the same candidates
        boxes_xyxy = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
        expected = []
        for c in range(nc):
            mask = scores[:, c] > 0.5
            if not mask.any():
                continue
            keep = ref_oracle.numpy_greedy_nms(boxes_xyxy[mask], scores[mask, c], 0.5)
            for k in keep:
                expected.append(scores[mask, c][k])
        assert len(out) == len(expected)
        np.testing.assert_allclose(sorted(out[:, 4]), sorted(expected), rtol=1e-6)

    def test_scale_boxes_roundtrip(self, native):
        boxes = np.asarray([[100, 180, 200, 280, 0.9, 0]], np.float32)
        out = native.scale_boxes(boxes.copy(), (640, 640), (480, 640))
        np.testing.assert_allclose(out[0, :4], [100, 100, 200, 200], atol=0.5)


class TestCppClient:
    def test_client_builds_and_reports_usage(self, tmp_path):
        """The client now EXECUTES a SavedModel session (TF C API); its full
        end-to-end parity test lives in test_cpp_client.py. Here: it builds
        and fails gracefully without arguments."""
        subprocess.run(["make", "-C", str(NATIVE), "client"], check=True, capture_output=True)
        cp = subprocess.run([str(NATIVE / "client")], capture_output=True, text=True)
        assert cp.returncode == 2
        assert "usage" in cp.stderr
