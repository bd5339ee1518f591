"""End-to-end: synthetic YOLO-format dataset -> DetectionTrainer -> mAP.

This is the M2 milestone gate (SURVEY.md §7): the full data pipeline
(mosaic/affine/HSV/flip), jitted train step, EMA validation, checkpointing,
and results.csv all exercised through the real trainer entrypoint.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))


def make_synthetic_dataset(root: Path, n_train=48, n_val=16, size=96, seed=3):
    """2-class dataset: class 0 = bright square, class 1 = dark circle."""
    import cv2

    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        img_dir = root / "images" / split
        lbl_dir = root / "labels" / split
        img_dir.mkdir(parents=True, exist_ok=True)
        lbl_dir.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = rng.integers(30, 70, (size, size, 3)).astype(np.uint8)
            lines = []
            for _ in range(int(rng.integers(1, 3))):
                w = int(rng.integers(18, 34))
                x0 = int(rng.integers(2, size - w - 2))
                y0 = int(rng.integers(2, size - w - 2))
                c = int(rng.integers(0, 2))
                if c == 0:
                    img[y0 : y0 + w, x0 : x0 + w] = [230, 220, 210]
                else:
                    cv2.circle(img, (x0 + w // 2, y0 + w // 2), w // 2, (10, 10, 15), -1)
                lines.append(
                    f"{c} {(x0 + w / 2) / size:.6f} {(y0 + w / 2) / size:.6f} {w / size:.6f} {w / size:.6f}"
                )
            cv2.imwrite(str(img_dir / f"{i:04d}.jpg"), img)
            (lbl_dir / f"{i:04d}.txt").write_text("\n".join(lines))
    yaml_path = root / "data.yaml"
    yaml_path.write_text(
        f"path: {root}\ntrain: images/train\nval: images/val\nnc: 2\n"
        "names:\n  0: square\n  1: circle\n"
    )
    return yaml_path


@pytest.mark.slow
def test_full_training_run(tmp_path):
    from bsyolo_tpu.engine.trainer import DetectionTrainer, load_checkpoint

    data_yaml = make_synthetic_dataset(tmp_path / "ds")
    tiny = str(Path(__file__).parent / "fixtures" / "tiny.yaml")
    # 28 epochs: the torch-matching kaiming-uniform init (nn/modules.py
    # TORCH_INIT, round 4) converges a few epochs later than the flax
    # default this test was calibrated against at 20 — measured fitness
    # 0.41 and still climbing at epoch 19
    trainer = DetectionTrainer(
        overrides={
            "model": tiny,
            "data": str(data_yaml),
            "epochs": 28,
            "batch": 8,
            "imgsz": 96,
            "optimizer": "SGD",
            "lr0": 0.02,
            "warmup_epochs": 1.0,
            "close_mosaic": 8,
            "project": str(tmp_path / "runs"),
            "name": "t",
            "max_gt": 32,
            "amp": False,
            "patience": 100,
            "nbs": 8,
        }
    )
    metrics = trainer.train()
    assert metrics is not None
    map50 = metrics.box.map50
    assert map50 > 0.5, f"mAP50 too low after training: {map50}"

    # checkpoints + results.csv written
    ckpt = tmp_path / "runs" / "t" / "weights" / "best.ckpt"
    assert ckpt.exists()
    payload, meta = load_checkpoint(ckpt)
    assert "ema_params" in payload and meta["epoch"] >= 0
    assert (tmp_path / "runs" / "t" / "results.csv").exists()


def test_dataset_and_loader(tmp_path, rng):
    from bsyolo_tpu.data import DataLoader, YOLODataset, load_dataset_yaml

    data_yaml = make_synthetic_dataset(tmp_path / "ds", n_train=12, n_val=4)
    data = load_dataset_yaml(data_yaml)
    assert data["nc"] == 2 and data["names"][0] == "square"

    ds = YOLODataset(data["train"], imgsz=64, augment=True, hyp={"mosaic": 1.0}, max_gt=16)
    assert len(ds) == 12
    s0 = ds.get_sample(0, rng)
    img, cls, boxes, mask = s0["img"], s0["cls"], s0["bboxes"], s0["mask"]
    # uint8 RGB by contract: batches ship to device at 1/4 the f32 bytes,
    # the compiled step normalizes (ops.normalize_image_batch)
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert cls.shape == (16,) and boxes.shape == (16, 4) and mask.shape == (16,)
    if mask.sum():
        valid = boxes[mask > 0]
        assert (valid >= 0).all() and (valid <= 1).all()

    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["img"].shape == (4, 64, 64, 3)

    # deterministic per epoch
    loader.set_epoch(0)
    a = next(iter(loader))
    loader.set_epoch(0)
    b = next(iter(loader))
    np.testing.assert_array_equal(a["img"], b["img"])

    # val (no augment) keeps exact letterboxed labels
    vds = YOLODataset(data["val"], imgsz=64, augment=False, max_gt=16)
    assert vds.get_sample(0, rng)["mask"].sum() >= 1


@pytest.mark.slow
def test_resume_and_callbacks(tmp_path):
    """Resume restores full state; callbacks fire; early stopping hooks in."""
    from bsyolo_tpu.engine.trainer import DetectionTrainer, load_checkpoint

    data_yaml = make_synthetic_dataset(tmp_path / "ds", n_train=16, n_val=8)
    tiny = str(Path(__file__).parent / "fixtures" / "tiny.yaml")
    common = {
        "model": tiny, "data": str(data_yaml), "batch": 8, "imgsz": 96,
        "optimizer": "SGD", "lr0": 0.01, "warmup_epochs": 0.5,
        "project": str(tmp_path / "runs"), "name": "t", "max_gt": 32,
        "amp": False, "nbs": 8, "close_mosaic": 0,
    }
    events = []
    t1 = DetectionTrainer(overrides={**common, "epochs": 3})
    t1.add_callback("on_train_epoch_start", lambda tr: events.append(tr.epoch))
    t1.train()
    assert events == [0, 1, 2]
    step_after_3 = int(t1.state.step)

    # resume to epoch 5: picks up at epoch 3 with the full optimizer state
    t2 = DetectionTrainer(overrides={**common, "epochs": 5, "resume": True})
    t2.train()
    assert t2.start_epoch == 3
    assert int(t2.state.step) == step_after_3 + 2 * len(t2.train_loader)
    payload, meta = load_checkpoint(tmp_path / "runs" / "t" / "weights" / "last.ckpt")
    assert meta["epoch"] == 4


@pytest.mark.slow
def test_segment_training_run(tmp_path):
    """Segment task end-to-end: polygon labels -> seg loss decreases, box mAP
    rises, masks come out of predict."""
    import cv2

    from bsyolo_tpu.engine.trainer import DetectionTrainer

    rng = np.random.default_rng(3)
    size = 96
    for split, n in (("train", 32), ("val", 8)):
        img_dir = tmp_path / "ds" / "images" / split
        lbl_dir = tmp_path / "ds" / "labels" / split
        img_dir.mkdir(parents=True)
        lbl_dir.mkdir(parents=True)
        for i in range(n):
            img = rng.integers(30, 70, (size, size, 3)).astype(np.uint8)
            w = int(rng.integers(24, 40))
            x0 = int(rng.integers(2, size - w - 2))
            y0 = int(rng.integers(2, size - w - 2))
            img[y0 : y0 + w, x0 : x0 + w] = [225, 215, 205]
            # polygon label: the square's 4 corners, normalized
            pts = [(x0, y0), (x0 + w, y0), (x0 + w, y0 + w), (x0, y0 + w)]
            poly = " ".join(f"{x / size:.6f} {y / size:.6f}" for x, y in pts)
            cv2.imwrite(str(img_dir / f"{i:04d}.jpg"), img)
            (lbl_dir / f"{i:04d}.txt").write_text(f"0 {poly}\n")
    (tmp_path / "ds" / "data.yaml").write_text(
        f"path: {tmp_path / 'ds'}\ntrain: images/train\nval: images/val\nnc: 2\n"
        "names:\n  0: square\n  1: other\n"
    )
    trainer = DetectionTrainer(
        overrides={
            "model": str(Path(__file__).parent / "fixtures" / "tinyseg.yaml"),
            "data": str(tmp_path / "ds" / "data.yaml"),
            "epochs": 32,
            "batch": 8,
            "imgsz": 96,
            "optimizer": "SGD",
            "lr0": 0.02,
            "warmup_epochs": 1.0,
            "project": str(tmp_path / "runs"),
            "name": "s",
            "max_gt": 8,
            "amp": False,
            "nbs": 8,
            "close_mosaic": 0,
        }
    )
    assert trainer.args is not None
    metrics = trainer.train()
    assert metrics.box.map50 > 0.3, f"box mAP50 too low: {metrics.box.map50}"
    assert hasattr(metrics, "seg"), "segment validator not used"
    assert metrics.seg.map50 > 0.2, f"mask mAP50 too low: {metrics.seg.map50}"

    # predict with the trained weights through the facade-style path
    from bsyolo_tpu.engine.predictor import DetectionPredictor

    variables = {"params": trainer.state.ema_params, "batch_stats": trainer.state.batch_stats}
    pred = DetectionPredictor(trainer.model, trainer.spec, variables, conf=0.2, imgsz=96)
    img = np.full((size, size, 3), 50, np.uint8)
    img[20:60, 30:70] = [225, 215, 205]
    res = pred(img)[0]
    assert len(res) >= 1
    assert res.masks is not None and len(res.masks) >= 1
    # the mask should overlap the painted square substantially
    m = res.masks.data[0]
    inside = m[25:55, 35:65].mean()
    outside = m[70:, :20].mean() if m[70:, :20].size else 0
    assert inside > 0.35, f"mask doesn't cover the object: inside={inside:.2f}"
    assert outside < 0.2


def test_extra_augmentations(rng):
    from bsyolo_tpu.data.augment import copy_paste, mixup, mosaic9

    imgs = [rng.integers(0, 255, (48, 64, 3)).astype(np.uint8) for _ in range(9)]
    labels = [
        (np.zeros((1,), np.float32), np.asarray([[10, 10, 30, 30]], np.float32)) for _ in range(9)
    ]
    img, cls, boxes, border = mosaic9(imgs, labels, 64, rng)
    assert img.shape == (128, 128, 3)
    assert (boxes >= 0).all() and (boxes <= 128).all()

    m_img, m_cls, m_boxes = mixup(imgs[0], labels[0], imgs[1], labels[1], rng)
    assert m_img.shape == imgs[0].shape
    assert len(m_cls) == 2 and len(m_boxes) == 2

    cp_img, cp_cls, cp_boxes = copy_paste(
        imgs[0], labels[0][0], labels[0][1], rng, p=1.0
    )
    assert len(cp_boxes) == 2  # original + mirrored copy
    assert cp_boxes[1][0] == 64 - 30 and cp_boxes[1][2] == 64 - 10


@pytest.mark.slow
def test_pose_training_run(tmp_path):
    """Pose task end-to-end: keypoint labels -> losses decrease, keypoints
    localize near the square's corners."""
    import cv2

    from bsyolo_tpu.engine.trainer import DetectionTrainer

    rng = np.random.default_rng(3)
    size = 96
    for split, n in (("train", 32), ("val", 8)):
        img_dir = tmp_path / "ds" / "images" / split
        lbl_dir = tmp_path / "ds" / "labels" / split
        img_dir.mkdir(parents=True)
        lbl_dir.mkdir(parents=True)
        for i in range(n):
            img = rng.integers(30, 70, (size, size, 3)).astype(np.uint8)
            w = int(rng.integers(28, 44))
            x0 = int(rng.integers(2, size - w - 2))
            y0 = int(rng.integers(2, size - w - 2))
            img[y0 : y0 + w, x0 : x0 + w] = [225, 215, 205]
            # 4 keypoints = the square's corners, all visible
            corners = [(x0, y0), (x0 + w, y0), (x0 + w, y0 + w), (x0, y0 + w)]
            kp = " ".join(f"{x / size:.6f} {y / size:.6f} 2" for x, y in corners)
            box = f"{(x0 + w / 2) / size:.6f} {(y0 + w / 2) / size:.6f} {w / size:.6f} {w / size:.6f}"
            cv2.imwrite(str(img_dir / f"{i:04d}.jpg"), img)
            (lbl_dir / f"{i:04d}.txt").write_text(f"0 {box} {kp}\n")
    (tmp_path / "ds" / "data.yaml").write_text(
        f"path: {tmp_path / 'ds'}\ntrain: images/train\nval: images/val\nnc: 1\nnames:\n  0: square\n"
    )
    trainer = DetectionTrainer(
        overrides={
            "model": str(Path(__file__).parent / "fixtures" / "tinypose.yaml"),
            "data": str(tmp_path / "ds" / "data.yaml"),
            "epochs": 56,
            "batch": 8,
            "imgsz": 96,
            "optimizer": "SGD",
            "lr0": 0.02,
            "warmup_epochs": 1.0,
            "project": str(tmp_path / "runs"),
            "name": "p",
            "max_gt": 8,
            "amp": False,
            "nbs": 8,
            "close_mosaic": 0,
        }
    )
    metrics = trainer.train()
    assert metrics.box.map50 > 0.3, f"pose box mAP50 too low: {metrics.box.map50}"
    assert hasattr(metrics, "pose"), "pose validator not used"
    assert metrics.pose.map50 > 0.2, f"OKS mAP50 too low: {metrics.pose.map50}"

    # keypoints from predict must land near the square corners
    from bsyolo_tpu.engine.predictor import DetectionPredictor

    variables = {"params": trainer.state.ema_params, "batch_stats": trainer.state.batch_stats}
    pred = DetectionPredictor(trainer.model, trainer.spec, variables, conf=0.2, imgsz=96)
    img = np.full((size, size, 3), 50, np.uint8)
    img[24:64, 30:70] = [225, 215, 205]
    res = pred(img)[0]
    assert len(res) >= 1 and res.keypoints is not None
    kxy = res.keypoints.xy[0]  # (4, 2)
    expected = np.asarray([[30, 24], [70, 24], [70, 64], [30, 64]], np.float32)
    err = np.abs(kxy - expected).mean()
    assert err < 14, f"keypoints too far from corners: mean err {err:.1f}px\n{kxy}"


@pytest.mark.slow
def test_obb_training_run(tmp_path):
    """OBB task: rotated-box corner labels -> loss decreases; trained model
    predicts rboxes overlapping the object with a sensible angle."""
    import cv2

    from bsyolo_tpu.engine.trainer import DetectionTrainer
    from bsyolo_tpu.engine.predictor import DetectionPredictor

    rng = np.random.default_rng(3)
    size = 96

    def rotated_scene(rng, ang_deg):
        img = np.full((size, size, 3), 50, np.uint8)
        cx, cy = float(rng.uniform(35, 61)), float(rng.uniform(35, 61))
        w, h = 44.0, 16.0
        rect = ((cx, cy), (w, h), ang_deg)
        pts = cv2.boxPoints(rect).astype(np.int32)
        cv2.fillPoly(img, [pts], (225, 215, 205))
        return img, cv2.boxPoints(rect)

    for split, n in (("train", 32), ("val", 8)):
        img_dir = tmp_path / "ds" / "images" / split
        lbl_dir = tmp_path / "ds" / "labels" / split
        img_dir.mkdir(parents=True)
        lbl_dir.mkdir(parents=True)
        for i in range(n):
            ang = float(rng.uniform(10, 40))
            img, pts = rotated_scene(rng, ang)
            coords = " ".join(f"{x / size:.6f} {y / size:.6f}" for x, y in pts)
            cv2.imwrite(str(img_dir / f"{i:04d}.jpg"), img)
            (lbl_dir / f"{i:04d}.txt").write_text(f"0 {coords}\n")
    (tmp_path / "ds" / "data.yaml").write_text(
        f"path: {tmp_path / 'ds'}\ntrain: images/train\nval: images/val\nnc: 1\nnames:\n  0: bar\n"
    )
    trainer = DetectionTrainer(
        overrides={
            "model": str(Path(__file__).parent / "fixtures" / "tinyobb.yaml"),
            "data": str(tmp_path / "ds" / "data.yaml"),
            # 36 epochs: mosaic/affine OBB augmentation (round 4) + the
            # torch-matching init need longer than round-3's letterbox-only
            # 28 to push predict-time confidences past 0.2 (fitness 0.77 at
            # 28 but the fresh-scene predict below still sat under conf)
            "epochs": 36,
            "batch": 8,
            "imgsz": 96,
            "optimizer": "SGD",
            "lr0": 0.02,
            "warmup_epochs": 1.0,
            "project": str(tmp_path / "runs"),
            "name": "o",
            "max_gt": 8,
            "amp": False,
            "nbs": 8,
            "close_mosaic": 0,
        }
    )
    metrics = trainer.train()
    assert metrics.box.map50 > 0.3, f"rotated mAP50 too low: {metrics.box.map50}"

    variables = {"params": trainer.state.ema_params, "batch_stats": trainer.state.batch_stats}
    pred = DetectionPredictor(trainer.model, trainer.spec, variables, conf=0.2, imgsz=96)
    img, pts = rotated_scene(np.random.default_rng(7), 25.0)
    res = pred(img)[0]
    assert res.obb is not None and len(res.obb) >= 1, "no rotated detections"
    rb = res.obb.xywhr[0]
    gt_c = pts.mean(0)
    assert np.abs(rb[0] - gt_c[0]) < 10 and np.abs(rb[1] - gt_c[1]) < 10, f"center off: {rb[:2]} vs {gt_c}"


def test_label_cache(tmp_path, rng):
    from bsyolo_tpu.data import YOLODataset, load_dataset_yaml

    data_yaml = make_synthetic_dataset(tmp_path / "ds", n_train=6, n_val=2)
    data = load_dataset_yaml(data_yaml)
    ds1 = YOLODataset(data["train"], imgsz=64, augment=False, max_gt=8)
    cache = ds1._cache_path()
    assert cache.exists(), "label cache not written"
    # second construction loads from the cache with identical labels
    ds2 = YOLODataset(data["train"], imgsz=64, augment=False, max_gt=8)
    for (c1, b1), (c2, b2) in zip(ds1.labels, ds2.labels):
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(b1, b2)
    # touching a label invalidates the cache
    lbl = Path(ds1.label_files[0])
    lbl.write_text("1 0.5 0.5 0.2 0.2\n")
    ds3 = YOLODataset(data["train"], imgsz=64, augment=False, max_gt=8)
    assert int(ds3.labels[0][0][0]) == 1


def test_pose_flip_idx(tmp_path):
    """hflip permutes left/right keypoints via flip_idx; without flip_idx the
    flip is disabled entirely (reference augment.py:1470, 2321-2326)."""
    from PIL import Image

    from bsyolo_tpu.data import YOLODataset

    root = tmp_path / "ds"
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir()
    img = np.random.default_rng(0).integers(0, 255, (96, 96, 3)).astype(np.uint8)
    Image.fromarray(img).save(root / "images" / "a.jpg")
    (root / "labels" / "a.txt").write_text(
        "0 0.4 0.5 0.2 0.3 0.30 0.5 2 0.50 0.5 2 0.35 0.4 2\n"
    )

    # geometric augments off so only the flip moves coordinates (the pose
    # path now runs the full mosaic/affine pipeline)
    still = {"fliplr": 1.0, "mosaic": 0.0, "translate": 0.0, "scale": 0.0,
             "albumentations": 0.0, "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0}

    # without flip_idx hflip must be disabled even at fliplr=1.0
    ds = YOLODataset(
        str(root / "images"), imgsz=64, augment=True, hyp=dict(still), max_gt=4, task="pose"
    )
    k = ds.get_sample(0, np.random.default_rng(1))["keypoints"][0]
    assert abs(k[0, 0] - 0.30) < 0.02 and abs(k[1, 0] - 0.50) < 0.02

    # with flip_idx=[1,0,2] a flipped sample mirrors x AND swaps kpt 0<->1
    ds2 = YOLODataset(
        str(root / "images"), imgsz=64, augment=True, hyp=dict(still), max_gt=4,
        task="pose", flip_idx=[1, 0, 2],
    )
    k2 = ds2.get_sample(0, np.random.default_rng(1))["keypoints"][0]
    assert abs(k2[0, 0] - 0.50) < 0.02 and abs(k2[1, 0] - 0.70) < 0.02, k2


def test_strip_optimizer(tmp_path):
    """strip_optimizer drops the embedded TrainState and promotes EMA
    (reference torch_utils.py:540); stripped files still load and resume
    degrades to weights-only."""
    import jax
    import jax.numpy as jnp

    from bsyolo_tpu.engine.train_step import init_train_state
    from bsyolo_tpu.engine.trainer import load_checkpoint, save_checkpoint, strip_optimizer

    params = {"m0": {"conv": {"kernel": jnp.ones((3, 3, 4, 8), jnp.float32)}}}
    stats = {"m0": {"bn": {"mean": jnp.zeros((8,)), "var": jnp.ones((8,))}}}
    state = init_train_state({"params": params, "batch_stats": stats})
    state = state.replace(ema_params=jax.tree_util.tree_map(lambda t: t * 2.0, state.params))

    p = tmp_path / "last.ckpt"
    save_checkpoint(p, state, {"epoch": 7}, full=True)
    full_size = p.stat().st_size

    saved = strip_optimizer(p)
    assert saved > 0 and p.stat().st_size < full_size
    payload, meta = load_checkpoint(p)
    assert "train_state" not in payload and meta["stripped"] is True
    assert meta["epoch"] == 7
    # EMA promoted to canonical params; the duplicate EMA tree is dropped
    # so the deployable artifact stores each weight once
    assert "ema_params" not in payload
    assert float(np.asarray(payload["params"]["m0"]["conv"]["kernel"]).mean()) == 2.0
    # idempotent
    size2 = p.stat().st_size
    strip_optimizer(p)
    assert p.stat().st_size == size2
