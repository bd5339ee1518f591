"""C++ client end-to-end: exported SavedModel executed via the TF C API must
produce the same boxes as the Python predict path (matching the reference
examples/YOLOv8-CPP-Inference capability of running a real session)."""

import json
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

REPO = Path(__file__).parent.parent


def _write_ppm(path, img):
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6 {w} {h} 255\n".encode())
        f.write(img.tobytes())


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
class TestCppClient:
    def test_savedmodel_client_matches_python(self, tmp_path):
        pytest.importorskip("tensorflow")
        from bsyolo_tpu import YOLO
        from bsyolo_tpu.engine.exporter import export_model

        imgsz = 96
        m = YOLO("tests/fixtures/tiny.yaml")
        m._img_size = imgsz
        # random-ish conv biases so some detections clear a tiny threshold
        out_dir = tmp_path / "tiny_saved"
        export_model(m, format="saved_model", imgsz=imgsz, output=str(out_dir))
        assert (out_dir / "saved_model.pb").exists()

        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (80, 96, 3), np.uint8)
        ppm = tmp_path / "img.ppm"
        _write_ppm(ppm, img)

        # build + run client
        subprocess.run(["make", "-C", str(REPO / "native"), "client"], check=True,
                       capture_output=True)
        proc = subprocess.run(
            [str(REPO / "native" / "client"), str(ppm), str(out_dir), "0.001", "0.7"],
            capture_output=True, text=True, check=True,
        )
        lines = [l for l in proc.stdout.splitlines() if l.startswith("box ")]
        cpp_boxes = np.asarray(
            [[float(x) for x in l.split()[1:5]] + [float(l.split()[6]), float(l.split()[8])]
             for l in lines], np.float32,
        ) if lines else np.zeros((0, 6), np.float32)

        # python reference boxes on the same image
        res = m.predict([img], conf=0.001, iou=0.7, imgsz=imgsz)[0]
        py_boxes = res.boxes.data if res.boxes is not None else np.zeros((0, 6), np.float32)
        py_boxes = py_boxes[py_boxes[:, 4] > 0]

        assert len(cpp_boxes) == len(py_boxes), (proc.stdout, py_boxes)
        if len(py_boxes):
            # same ordering (confidence-sorted greedy NMS both sides)
            np.testing.assert_allclose(cpp_boxes[:, :4], py_boxes[:, :4], atol=1.5)
            np.testing.assert_allclose(cpp_boxes[:, 4], py_boxes[:, 4], atol=1e-3)
