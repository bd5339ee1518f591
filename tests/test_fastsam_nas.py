"""FastSAM prompt selection + NAS postprocess contract tests."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))


class TestFastSAM:
    def test_yaml_parses_nc1(self):
        from bsyolo_tpu.cfg import model_yaml_path
        from bsyolo_tpu.nn import load_model_yaml, parse_model_yaml

        d = load_model_yaml(model_yaml_path("yolov8s-seg.yaml"))
        d["nc"] = 1
        spec = parse_model_yaml(d, scale="s")
        assert spec.head.module == "Segment"
        assert spec.nc == 1

    def test_border_snap(self):
        from bsyolo_tpu.models.fastsam import adjust_bboxes_to_image_border

        b = np.asarray([[5.0, 5.0, 630.0, 470.0], [100.0, 100.0, 200.0, 200.0]])
        out = adjust_bboxes_to_image_border(b, (480, 640))
        np.testing.assert_allclose(out[0], [0, 0, 640, 480])
        np.testing.assert_allclose(out[1], b[1])

    def _fake_result(self):
        from bsyolo_tpu.engine.results import Results

        img = np.zeros((64, 64, 3), np.uint8)
        masks = np.zeros((3, 64, 64), np.float32)
        masks[0, 5:20, 5:20] = 1  # top-left square
        masks[1, 30:60, 30:60] = 1  # bottom-right square
        masks[2, 0:64, 0:10] = 1  # left band
        boxes = np.asarray(
            [[5, 5, 20, 20, 0.9, 0], [30, 30, 60, 60, 0.8, 0], [0, 0, 10, 64, 0.7, 0]],
            np.float32,
        )
        return Results(img, "", {0: "object"}, boxes=boxes, masks=masks)

    def test_bbox_prompt_selects_best_iou(self):
        from bsyolo_tpu.models.fastsam import FastSAM

        r = FastSAM._prompt(self._fake_result(), bboxes=[[28, 28, 62, 62]])
        assert len(r.masks.data) == 1
        assert r.masks.data[0, 45, 45] == 1  # bottom-right mask chosen

    def test_point_prompt_selects_containing(self):
        from bsyolo_tpu.models.fastsam import FastSAM

        r = FastSAM._prompt(self._fake_result(), points=[[5, 40]], labels=[1])
        # point (5,40) is inside only the left band (mask 2)
        assert len(r.masks.data) == 1
        assert r.masks.data[0, 40, 5] == 1

    def test_negative_point_excludes(self):
        from bsyolo_tpu.models.fastsam import FastSAM

        r = FastSAM._prompt(
            self._fake_result(), points=[[10, 10], [2, 40]], labels=[1, 0]
        )
        # (10,10) selects masks 0+2; (2,40) with label 0 removes the band (2)
        assert len(r.masks.data) == 1
        assert r.masks.data[0, 10, 10] == 1


class TestNAS:
    def test_postprocess_contract(self):
        import jax.numpy as jnp

        from bsyolo_tpu.models.nas import postprocess_nas

        boxes = jnp.asarray(
            [[[10.0, 10.0, 50.0, 50.0], [12.0, 12.0, 52.0, 52.0], [100.0, 100.0, 150.0, 150.0]]]
        )
        scores = jnp.asarray([[[0.9, 0.01], [0.6, 0.02], [0.05, 0.8]]])
        out = np.asarray(postprocess_nas(boxes, scores, conf_thres=0.25, iou_thres=0.5, max_det=10))
        kept = out[0][out[0, :, 4] > 0]
        # overlapping pair suppressed to one; distant class-1 box kept
        assert len(kept) == 2
        assert set(kept[:, 5].astype(int).tolist()) == {0, 1}

    def test_facade_refuses_offline(self):
        from bsyolo_tpu.models.nas import NAS

        with pytest.raises(NotImplementedError):
            NAS("yolo_nas_s.pt")
        with pytest.raises(AssertionError):
            NAS("model.yaml")
