"""Multi-task coverage: segmentation/classification forward, decode, losses."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp


def build(yaml_name, scale="n", img=64):
    from bsyolo_tpu.cfg import model_yaml_path
    from bsyolo_tpu.nn import build_model, load_model_yaml, parse_model_yaml

    d = load_model_yaml(model_yaml_path(yaml_name))
    d["nc"] = 4
    spec = parse_model_yaml(d, scale=scale)
    model, variables = build_model(spec, img_size=img)
    return spec, model, variables


class TestSegmentForward:
    def test_output_structure_and_predict(self):
        from bsyolo_tpu import YOLO

        spec, model, variables = build("yolo11n-seg.yaml")
        assert spec.task == "segment"
        out = jax.jit(lambda v, x: model.apply(v, x, train=False))(
            variables, jnp.zeros((1, 64, 64, 3))
        )
        assert set(out.keys()) == {"feats", "proto"}
        assert out["proto"].shape == (1, 16, 16, 32)  # proto at /4, nm=32 (unscaled)

    def test_seg_loss_runs_and_grads(self, rng):
        from bsyolo_tpu.losses import DetectionLossConfig, init_loss_state
        from bsyolo_tpu.losses.segment import segmentation_loss

        spec, model, variables = build("yolo11n-seg.yaml")
        nm = spec.head.args[1]  # 32, unscaled (reference head.py Segment)
        B, M = 2, 4
        out = model.apply(variables, jnp.zeros((B, 64, 64, 3)), train=False)
        cfg = DetectionLossConfig(nc=spec.nc, strides=spec.head_strides)
        boxes = np.zeros((B, M, 4), np.float32)
        boxes[:, 0] = [0.5, 0.5, 0.4, 0.4]
        cls = np.zeros((B, M), np.int32)
        mask = np.zeros((B, M), np.float32)
        mask[:, 0] = 1
        hm, wm = out["proto"].shape[1:3]
        gmasks = np.zeros((B, hm, wm), np.int32)
        gmasks[:, 4:12, 4:12] = 1  # instance 0 occupies the center
        total, items, st = segmentation_loss(
            out,
            jnp.asarray(cls),
            jnp.asarray(boxes),
            jnp.asarray(mask),
            jnp.asarray(gmasks),
            init_loss_state(),
            cfg,
            nm=nm,
            max_masks=16,
        )
        assert np.isfinite(float(total))
        assert items.shape == (4,)  # box, seg, cls, dfl
        assert float(items[1]) > 0  # seg term active

        def loss_of(params):
            o = model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                            jnp.zeros((B, 64, 64, 3)), train=False)
            t, _, _ = segmentation_loss(
                o, jnp.asarray(cls), jnp.asarray(boxes), jnp.asarray(mask),
                jnp.asarray(gmasks), init_loss_state(), cfg, nm=nm, max_masks=16)
            return t

        g = jax.jit(jax.grad(loss_of))(variables["params"])
        assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree_util.tree_leaves(g))

    def test_segment_predict_masks(self):
        from bsyolo_tpu import YOLO
        from bsyolo_tpu.cfg import model_yaml_path

        m = YOLO(str(model_yaml_path("yolo11n-seg.yaml")))
        m._new(str(model_yaml_path("yolo11n-seg.yaml")), img_size=64)
        img = np.full((100, 120, 3), 60, np.uint8)
        img[20:70, 30:90] = 220
        res = m.predict(img, conf=0.00001, max_det=8)[0]
        if len(res):
            assert res.masks is not None
            assert res.masks.data.shape[1:] == (100, 120)
            assert set(np.unique(res.masks.data)) <= {0.0, 1.0}


class TestClassify:
    def test_forward_and_predict(self):
        from bsyolo_tpu import YOLO
        from bsyolo_tpu.cfg import model_yaml_path

        spec, model, variables = build("yolo11n-cls.yaml")
        assert spec.task == "classify"
        out = jax.jit(lambda v, x: model.apply(v, x, train=False))(
            variables, jnp.zeros((2, 64, 64, 3))
        )
        assert out.shape == (2, 4)

        m = YOLO(str(model_yaml_path("yolo11n-cls.yaml")))
        m._new(str(model_yaml_path("yolo11n-cls.yaml")), img_size=64)
        res = m.predict(np.zeros((80, 80, 3), np.uint8))[0]
        assert res.probs is not None
        assert 0 <= res.probs.top1 < 80
        assert len(res.probs.top5) == 5

    def test_classification_loss(self, rng):
        from bsyolo_tpu.losses.classify import classification_loss
        from bsyolo_tpu.losses import init_loss_state

        logits = jnp.asarray(rng.normal(0, 1, (8, 10)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 10, (8,)))
        total, items, _ = classification_loss(logits, labels, init_loss_state())
        assert np.isfinite(float(total)) and items.shape == (1,)
        # perfect logits -> near-zero loss
        perfect = jax.nn.one_hot(labels, 10) * 100.0
        t2, _, _ = classification_loss(perfect, labels, init_loss_state())
        assert float(t2) < 1e-3


class TestPoseOBB:
    def test_pose_predict_keypoints(self):
        from bsyolo_tpu import YOLO
        from bsyolo_tpu.cfg import model_yaml_path

        m = YOLO(str(model_yaml_path("yolo11n-pose.yaml")))
        m._new(str(model_yaml_path("yolo11n-pose.yaml")), img_size=64)
        assert m.spec.task == "pose"
        img = np.full((80, 100, 3), 60, np.uint8)
        img[20:60, 30:70] = 220
        res = m.predict(img, conf=0.00001, max_det=8)[0]
        if len(res):
            assert res.keypoints is not None
            assert res.keypoints.data.shape[1:] == (17, 3)
            # decoded keypoints live in original-image coords
            assert np.all(res.keypoints.conf >= 0) and np.all(res.keypoints.conf <= 1)

    def test_obb_predict_rotated(self):
        from bsyolo_tpu import YOLO
        from bsyolo_tpu.cfg import model_yaml_path

        m = YOLO(str(model_yaml_path("yolo11n-obb.yaml")))
        m._new(str(model_yaml_path("yolo11n-obb.yaml")), img_size=64)
        assert m.spec.task == "obb"
        img = np.full((80, 100, 3), 60, np.uint8)
        img[20:60, 30:70] = 220
        res = m.predict(img, conf=0.00001, max_det=8)[0]
        if res.obb is not None and len(res.obb):
            xywhr = res.obb.xywhr
            assert xywhr.shape[1] == 5
            # angles within the head's (-pi/4, 3pi/4) range
            assert np.all(xywhr[:, 4] > -np.pi / 4 - 1e-3)
            assert np.all(xywhr[:, 4] < 3 * np.pi / 4 + 1e-3)
            corners = res.obb.xyxyxyxy
            assert corners.shape[1:] == (4, 2)


class TestProbIoU:
    def test_probiou_matches_reference(self, rng):
        import torch

        import ref_oracle
        from bsyolo_tpu.ops.obb import probiou

        ns = ref_oracle._extract(
            "ultralytics/utils/metrics.py", ("probiou", "_get_covariance_matrix")
        )
        n = 32
        obb1 = np.concatenate(
            [rng.uniform(20, 80, (n, 2)), rng.uniform(5, 30, (n, 2)), rng.uniform(-0.7, 2.3, (n, 1))],
            -1,
        ).astype(np.float32)
        obb2 = np.concatenate(
            [rng.uniform(20, 80, (n, 2)), rng.uniform(5, 30, (n, 2)), rng.uniform(-0.7, 2.3, (n, 1))],
            -1,
        ).astype(np.float32)
        ref = ns["probiou"](torch.from_numpy(obb1), torch.from_numpy(obb2)).numpy()
        got = np.asarray(probiou(jnp.asarray(obb1), jnp.asarray(obb2)))[..., 0]
        np.testing.assert_allclose(got, ref.squeeze(-1) if ref.ndim > 1 else ref, rtol=1e-4, atol=1e-5)


class TestPoseLoss:
    def test_pose_loss_runs_and_grads(self, rng):
        from bsyolo_tpu.losses import DetectionLossConfig, init_loss_state
        from bsyolo_tpu.losses.pose import pose_loss

        spec, model, variables = build("yolo11n-pose.yaml")
        assert spec.task == "pose"
        B, M, nkpt = 2, 4, 17
        out = model.apply(variables, jnp.zeros((B, 64, 64, 3)), train=False)
        cfg = DetectionLossConfig(nc=spec.nc, strides=spec.head_strides)
        boxes = np.zeros((B, M, 4), np.float32)
        boxes[:, 0] = [0.5, 0.5, 0.5, 0.5]
        cls = np.zeros((B, M), np.int32)
        mask = np.zeros((B, M), np.float32)
        mask[:, 0] = 1
        kpts = np.zeros((B, M, nkpt, 3), np.float32)
        kpts[:, 0, :, 0] = rng.uniform(0.3, 0.7, (B, nkpt))
        kpts[:, 0, :, 1] = rng.uniform(0.3, 0.7, (B, nkpt))
        kpts[:, 0, :, 2] = 2.0  # visible

        total, items, st = pose_loss(
            out, jnp.asarray(cls), jnp.asarray(boxes), jnp.asarray(mask),
            jnp.asarray(kpts), init_loss_state(), cfg,
        )
        assert np.isfinite(float(total))
        assert items.shape == (5,)  # box, pose, kobj, cls, dfl
        assert float(items[1]) > 0 and float(items[2]) > 0

        def loss_of(params):
            o = model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                            jnp.zeros((B, 64, 64, 3)), train=False)
            t, _, _ = pose_loss(o, jnp.asarray(cls), jnp.asarray(boxes), jnp.asarray(mask),
                                jnp.asarray(kpts), init_loss_state(), cfg)
            return t

        g = jax.jit(jax.grad(loss_of))(variables["params"])
        assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree_util.tree_leaves(g))


@pytest.mark.slow
def test_classification_training(tmp_path):
    """Full classify train: color-separable 2-class folders -> high top-1."""
    import cv2

    from bsyolo_tpu.engine.classify import ClassificationTrainer

    rng = np.random.default_rng(0)
    for split, n in (("train", 32), ("val", 12)):
        for ci, color in enumerate(([40, 40, 200], [200, 40, 40])):  # red vs blue
            d = tmp_path / "ds" / split / f"class{ci}"
            d.mkdir(parents=True)
            for i in range(n):
                img = np.full((48, 48, 3), color, np.uint8)
                img += rng.integers(0, 40, img.shape).astype(np.uint8)
                cv2.imwrite(str(d / f"{i}.jpg"), img)
    tr = ClassificationTrainer(
        overrides={
            "model": str(Path(__file__).parent / "fixtures" / "tinycls.yaml"),
            "data": str(tmp_path / "ds"),
            "epochs": 24,
            "batch": 16,
            "imgsz": 48,
            "optimizer": "SGD",
            "lr0": 0.03,
            "warmup_epochs": 0.5,
            "project": str(tmp_path / "runs"),
            "name": "c",
            "amp": False,
            "nbs": 16,
        }
    )
    metrics = tr.train()
    assert metrics.top1 > 0.8, f"top1 too low: {metrics.top1}"
    assert (tmp_path / "runs" / "c" / "weights" / "best.ckpt").exists()


class TestOBBLoss:
    def test_obb_loss_runs_and_grads(self, rng):
        from bsyolo_tpu.losses import DetectionLossConfig, init_loss_state
        from bsyolo_tpu.losses.obb import obb_loss

        spec, model, variables = build("yolo11n-obb.yaml")
        assert spec.task == "obb"
        B, M = 2, 4
        feats = model.apply(variables, jnp.zeros((B, 64, 64, 3)), train=False)
        cfg = DetectionLossConfig(nc=spec.nc, strides=spec.head_strides)
        rboxes = np.zeros((B, M, 5), np.float32)
        rboxes[:, 0] = [0.5, 0.5, 0.4, 0.2, 0.4]  # rotated box
        cls = np.zeros((B, M), np.int32)
        mask = np.zeros((B, M), np.float32)
        mask[:, 0] = 1
        total, items, st = obb_loss(
            feats, jnp.asarray(cls), jnp.asarray(rboxes), jnp.asarray(mask),
            init_loss_state(), cfg,
        )
        assert np.isfinite(float(total)) and items.shape == (3,)
        assert float(items[0]) > 0

        def loss_of(params):
            f = model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                            jnp.zeros((B, 64, 64, 3)), train=False)
            t, _, _ = obb_loss(f, jnp.asarray(cls), jnp.asarray(rboxes), jnp.asarray(mask),
                               init_loss_state(), cfg)
            return t

        g = jax.jit(jax.grad(loss_of))(variables["params"])
        assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree_util.tree_leaves(g))

    def test_obb_loss_grads_finite_with_zero_instances(self, rng):
        """Regression (round 4): a mosaic sample can end with ZERO instances
        (the candidate filter drops every gt), so all target rboxes are the
        zero pad row; probiou's sqrt(u*v) then sat at exactly 0, whose 0/0
        Jacobian NaN-poisoned EVERY loss term's gradients through the shared
        trunk (loss VALUES stayed finite — only training died)."""
        from bsyolo_tpu.losses import DetectionLossConfig, init_loss_state
        from bsyolo_tpu.losses.obb import obb_loss

        spec, model, variables = build("yolo11n-obb.yaml")
        B, M = 2, 4
        cfg = DetectionLossConfig(nc=spec.nc, strides=spec.head_strides)
        # image 0 has one gt, image 1 has none (all-zero pad rows)
        rboxes = np.zeros((B, M, 5), np.float32)
        rboxes[0, 0] = [0.5, 0.5, 0.4, 0.2, 0.4]
        cls = np.zeros((B, M), np.int32)
        mask = np.zeros((B, M), np.float32)
        mask[0, 0] = 1
        x = rng.uniform(0, 1, (B, 64, 64, 3)).astype(np.float32)

        def loss_of(params):
            f = model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                            jnp.asarray(x), train=False)
            t, _, _ = obb_loss(f, jnp.asarray(cls), jnp.asarray(rboxes), jnp.asarray(mask),
                               init_loss_state(), cfg)
            return t

        t = float(jax.jit(loss_of)(variables["params"]))
        assert np.isfinite(t)
        g = jax.jit(jax.grad(loss_of))(variables["params"])
        assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree_util.tree_leaves(g))

    def test_rotated_candidates(self, rng):
        from bsyolo_tpu.losses.obb import _candidates_in_rotated_gts

        # a 45-degree box at center (50, 50), w=20, h=10
        rbox = jnp.asarray([[[50.0, 50.0, 20.0, 10.0, np.pi / 4]]])
        pts = jnp.asarray([[50.0, 50.0], [56.0, 44.0], [80.0, 80.0], [44.0, 44.0]])
        got = np.asarray(_candidates_in_rotated_gts(pts, rbox))[0, 0]
        assert got[0]  # center inside
        assert not got[2]  # far away outside
