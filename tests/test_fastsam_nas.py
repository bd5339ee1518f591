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

    def test_facade_refuses_pickled_checkpoints(self):
        from bsyolo_tpu.models.nas import NAS

        with pytest.raises(NotImplementedError):
            NAS("yolo_nas_s.pt")

    @pytest.mark.parametrize(
        "name,published_m",
        [("yolo_nas_s", 19.0), ("yolo_nas_m", 51.1), ("yolo_nas_l", 66.9)],
    )
    def test_reconstructed_graph_param_budget(self, name, published_m):
        """The offline NAS graphs (cfg/models/nas/) are structure-level
        reconstructions; their parameter budgets must land within 5% of the
        published super-gradients model sizes (S 19.0M / M 51.1M / L 66.9M).
        Topology and stage widths/depths follow the public architecture;
        per-stage CSP hidden widths are calibrated to the published totals —
        the full fidelity/divergence accounting is docs/nas_reconstruction.md
        (round-5, VERDICT r4 #6)."""
        from test_zoo_all import shape_param_count

        from bsyolo_tpu.cfg import model_yaml_path
        from bsyolo_tpu.nn import load_model_yaml, parse_model_yaml

        spec = parse_model_yaml(load_model_yaml(model_yaml_path(name + ".yaml")))
        assert spec.reg_max == 17 and spec.head_strides == (8, 16, 32)
        n = shape_param_count(spec) / 1e6
        assert abs(n - published_m) / published_m < 0.05, (name, n)

    def test_nas_decode_uses_17_bins(self):
        """detect_postprocess(reg_max=17) on NAS head maps must equal the
        decode_detections (bin-count-inferring) + NMS ground truth, and
        differ from a (wrong) 16-bin decode — guards the ModelSpec.reg_max
        plumbing through predictor/validator."""
        import jax.numpy as jnp
        from pathlib import Path

        from bsyolo_tpu.kernels.postprocess import detect_postprocess
        from bsyolo_tpu.nn import build_model, load_model_yaml, parse_model_yaml
        from bsyolo_tpu.nn.heads import decode_detections
        from bsyolo_tpu.nn.model import make_forward
        from bsyolo_tpu.ops.nms import non_max_suppression

        spec = parse_model_yaml(
            load_model_yaml(Path(__file__).parent / "fixtures" / "tiny_nas.yaml")
        )
        model, variables = build_model(spec, img_size=96, seed=1)
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 96, 96, 3)).astype(np.float32)
        )
        feats = make_forward(model)(variables, x)
        assert feats[0].shape[-1] == 4 * 17 + spec.nc
        ref = non_max_suppression(
            # reg_max must be explicit: inference from the channel count was
            # removed (it silently mis-split segment/pose maps with extras)
            decode_detections(feats, spec.head_strides, spec.nc, reg_max=spec.reg_max),
            conf_thres=0.0001, iou_thres=0.7, max_det=30,
        )
        got = detect_postprocess(
            feats, spec.head_strides, spec.nc, conf_thres=0.0001, iou_thres=0.7,
            max_det=30, reg_max=spec.reg_max,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
        bad = detect_postprocess(
            feats, spec.head_strides, spec.nc, conf_thres=0.0001, iou_thres=0.7,
            max_det=30, reg_max=16,
        )
        assert not np.allclose(np.asarray(bad), np.asarray(ref), atol=1e-4)

    @pytest.mark.slow
    def test_tiny_nas_trains(self, tmp_path):
        """The reconstructed NAS family trains through the standard detect
        machinery (17-bin DFL loss via DetectionLossConfig.reg_max)."""
        from pathlib import Path

        from test_e2e_train import make_synthetic_dataset

        from bsyolo_tpu.engine.trainer import DetectionTrainer

        data_yaml = make_synthetic_dataset(tmp_path / "data", n_train=16, n_val=8)
        t = DetectionTrainer(
            overrides={
                "model": str(Path(__file__).parent / "fixtures" / "tiny_nas.yaml"),
                "data": str(data_yaml),
                "epochs": 2,
                "batch": 8,
                "imgsz": 96,
                "project": str(tmp_path / "runs"),
                "name": "nas",
                "plots": False,
                "val": False,
                "workers": 0,
            }
        )
        t.train()
        assert (tmp_path / "runs" / "nas" / "results.csv").exists()

    def test_tiny_nas_facade_predict(self, tmp_path):
        """End-to-end through the facade: the 17-bin NDFL head must flow
        through the shared detect decode/NMS (ModelSpec.reg_max plumbing)."""
        from pathlib import Path

        from bsyolo_tpu.model import YOLO

        m = YOLO(str(Path(__file__).parent / "fixtures" / "tiny_nas.yaml"))
        img = np.random.default_rng(0).uniform(0, 255, (96, 96, 3)).astype(np.uint8)
        res = m.predict(img, imgsz=96, conf=0.0001)[0]
        assert res.boxes is not None
        if len(res.boxes):  # any box decoded inside the canvas
            assert float(res.boxes.xyxy.max()) <= 96.0
