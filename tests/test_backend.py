"""AutoBackend: uniform forward over every exported artifact."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    """Export the tiny model to every format once."""
    tmp = tmp_path_factory.mktemp("artifacts")
    from bsyolo_tpu import YOLO
    from bsyolo_tpu.engine.exporter import export_model

    m = YOLO("tests/fixtures/tiny.yaml")
    m._img_size = 64
    paths = {"yaml": "tests/fixtures/tiny.yaml"}
    paths["stablehlo"] = export_model(m, format="stablehlo", imgsz=64,
                                      output=str(tmp / "tiny.stablehlo"))
    try:
        paths["saved_model"] = export_model(m, format="saved_model", imgsz=64,
                                            output=str(tmp / "tiny_sm"))
        paths["tflite"] = export_model(m, format="tflite", imgsz=64,
                                       output=str(tmp / "tiny"))
    except RuntimeError:
        pass  # tensorflow absent
    return m, paths


class TestAutoBackend:
    def test_all_artifacts_agree(self, artifacts):
        from bsyolo_tpu.engine.backend import AutoBackend

        m, paths = artifacts
        x = np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
        ref = AutoBackend(paths["yaml"], imgsz=64)
        # the yaml path builds FRESH weights; compare exported artifacts only
        outs = {}
        for kind in ("stablehlo", "saved_model", "tflite"):
            if kind in paths:
                b = AutoBackend(paths[kind], imgsz=64).warmup()
                outs[kind] = b.forward(x)
        assert "stablehlo" in outs
        shapes = {o.shape for o in outs.values()}
        assert len(shapes) == 1  # identical output shapes
        base = outs["stablehlo"]
        for kind, o in outs.items():
            np.testing.assert_allclose(o, base, rtol=1e-2, atol=1e-3), kind

    def test_unsupported_raises(self):
        from bsyolo_tpu.engine.backend import AutoBackend

        with pytest.raises(ValueError):
            AutoBackend("model.engine")
