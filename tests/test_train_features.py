"""Trainer feature flags: freeze / save_period / pretrained / multi_scale.

These are the reference's train-arg surface (trainer.py:252 freeze,
:547 save_period epoch snapshots, pretrained warm-start, detect/train.py
multi_scale) wired through the same config keys.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from test_e2e_train import make_synthetic_dataset  # noqa: E402

TINY = str(Path(__file__).parent / "fixtures" / "tiny.yaml")


def _overrides(data_yaml, tmp_path, **kw):
    d = {
        "model": TINY, "data": str(data_yaml), "epochs": 2, "batch": 8,
        "imgsz": 64, "optimizer": "SGD", "warmup_epochs": 0.0,
        "project": str(tmp_path / "runs"), "name": "t", "max_gt": 16,
        "amp": False, "nbs": 8, "val": False, "plots": False, "mosaic": 0.0,
        "workers": 0,
    }
    d.update(kw)
    return d


@pytest.fixture(scope="module")
def data_yaml(tmp_path_factory):
    return make_synthetic_dataset(tmp_path_factory.mktemp("ds") / "d", n_train=16, n_val=8, size=64)


def test_freeze_layers_stay_fixed(data_yaml, tmp_path):
    import jax

    from bsyolo_tpu.engine.trainer import DetectionTrainer

    tr = DetectionTrainer(overrides=_overrides(data_yaml, tmp_path, freeze=2, epochs=1))
    tr.start_epoch = 0
    tr.setup()
    assert set(tr.step_cfg.frozen) == {"m0", "m1"}
    before = jax.tree_util.tree_map(np.asarray, tr.state.params)
    metrics = tr.train()  # runs setup again internally; re-grab state after
    after = jax.tree_util.tree_map(np.asarray, tr.state.params)

    def l2_delta(key):
        a = jax.tree_util.tree_leaves(before[key])
        b = jax.tree_util.tree_leaves(after[key])
        return sum(float(np.abs(x - y).sum()) for x, y in zip(a, b))

    assert l2_delta("m0") == 0.0 and l2_delta("m1") == 0.0, "frozen layers moved"
    moved = [k for k in after if k not in ("m0", "m1") and l2_delta(k) > 0]
    assert moved, "no unfrozen layer trained"


def test_underfeed_warning_fires_when_loader_starves_device(
    data_yaml, tmp_path, monkeypatch, caplog
):
    """VERDICT r4 #8: the trainer warns once when a post-compile epoch spends
    >50% of its wall blocked inside the loader. Simulated by slowing the
    dataset's sample assembly so loader wait dominates the tiny train step."""
    import logging
    import time as _time

    from bsyolo_tpu.data.dataset import YOLODataset
    from bsyolo_tpu.engine.trainer import DetectionTrainer

    orig = YOLODataset.get_sample

    def slow(self, i, rng, **kw):
        _time.sleep(0.2)
        return orig(self, i, rng, **kw)

    monkeypatch.setattr(YOLODataset, "get_sample", slow)
    tr = DetectionTrainer(overrides=_overrides(data_yaml, tmp_path, epochs=2))
    with caplog.at_level(logging.WARNING, logger="bsyolo_tpu"):
        tr.train()
    assert any("underfeeds the device" in r.message for r in caplog.records), (
        "no underfeed warning despite a loader-starved epoch"
    )
    assert sum("underfeeds the device" in r.message for r in caplog.records) == 1


def test_save_period_writes_epoch_ckpts(data_yaml, tmp_path):
    from bsyolo_tpu.engine.trainer import DetectionTrainer

    tr = DetectionTrainer(overrides=_overrides(data_yaml, tmp_path, epochs=3, save_period=2))
    tr.train()
    w = tmp_path / "runs" / "t" / "weights"
    assert (w / "epoch0.ckpt").exists() and (w / "epoch2.ckpt").exists()
    assert not (w / "epoch1.ckpt").exists()


def test_pretrained_warm_start(data_yaml, tmp_path):
    from bsyolo_tpu.engine.trainer import DetectionTrainer

    a = DetectionTrainer(overrides=_overrides(data_yaml, tmp_path, name="a", epochs=1))
    a.train()
    best = tmp_path / "runs" / "a" / "weights" / "last.ckpt"
    assert best.exists()

    b = DetectionTrainer(
        overrides=_overrides(data_yaml, tmp_path, name="b", epochs=1, pretrained=str(best))
    )
    b.start_epoch = 0
    b.setup()
    import jax

    ref = jax.tree_util.tree_map(np.asarray, a.state.ema_params)
    got = jax.tree_util.tree_map(np.asarray, b.state.params)
    leaf_r = jax.tree_util.tree_leaves(ref)[0]
    leaf_g = jax.tree_util.tree_leaves(got)[0]
    np.testing.assert_allclose(leaf_r, leaf_g, rtol=1e-6)


def test_multi_scale_buckets(data_yaml, tmp_path):
    from bsyolo_tpu.engine.trainer import DetectionTrainer

    tr = DetectionTrainer(overrides=_overrides(data_yaml, tmp_path, multi_scale=True, epochs=1))
    tr.start_epoch = 0
    tr.setup()
    assert tr._ms_sizes == [32, 64, 96]  # 0.5x..1.5x of 64, stride-32 snapped
    import jax.numpy as jnp

    batch = {"img": jnp.zeros((2, 64, 64, 3), jnp.float32)}
    sizes = {int(tr._apply_multi_scale(batch, ni)["img"].shape[1]) for ni in range(40)}
    assert len(sizes) >= 3 and sizes <= set(tr._ms_sizes)
    # determinism: same step index -> same bucket
    s1 = tr._apply_multi_scale(batch, 7)["img"].shape
    s2 = tr._apply_multi_scale(batch, 7)["img"].shape
    assert s1 == s2


def test_classify_dropout_and_randaugment(tmp_path):
    """Classify train with dropout>0 + auto_augment=randaugment + erasing:
    the head gets a real Dropout (train-only), the pipeline the RandAugment
    op suite — short color-separable run still learns."""
    import cv2

    from bsyolo_tpu.engine.classify import ClassificationTrainer

    rng = np.random.default_rng(0)
    for split, n in (("train", 24), ("val", 8)):
        for ci, color in enumerate(([40, 40, 200], [200, 40, 40])):
            d = tmp_path / "ds" / split / f"class{ci}"
            d.mkdir(parents=True)
            for i in range(n):
                img = np.full((48, 48, 3), color, np.uint8)
                img += rng.integers(0, 40, img.shape).astype(np.uint8)
                cv2.imwrite(str(d / f"{i}.jpg"), img)
    tr = ClassificationTrainer(
        overrides={
            # 20 epochs: randaugment's solarize/color ops attack the only
            # discriminative feature (hue), and the torch-matching init
            # (TORCH_INIT) needs a few more passes at this seed than the old
            # flax default that 10 epochs was calibrated against
            "model": str(Path(__file__).parent / "fixtures" / "tinycls.yaml"),
            "data": str(tmp_path / "ds"), "epochs": 20, "batch": 16, "imgsz": 48,
            "optimizer": "SGD", "lr0": 0.03, "warmup_epochs": 0.5,
            "project": str(tmp_path / "runs"), "name": "c", "amp": False,
            "nbs": 16, "dropout": 0.3, "auto_augment": "randaugment",
            "erasing": 0.4,
        }
    )
    metrics = tr.train()
    assert tr.spec.dropout == 0.3
    assert metrics.top1 > 0.6, f"top1 too low with dropout+randaugment: {metrics.top1}"
    # train-mode forward actually drops: two rngs give different logits
    import jax
    import jax.numpy as jnp

    v = {"params": tr.state.params, "batch_stats": tr.state.batch_stats}
    x = jnp.ones((1, 48, 48, 3), jnp.float32)
    a = tr.model.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(0)},
                       mutable=["batch_stats"])[0]
    b = tr.model.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                       mutable=["batch_stats"])[0]
    assert not np.allclose(np.asarray(a), np.asarray(b)), "dropout inert in train mode"
    # eval mode is deterministic (no rng needed)
    c = tr.model.apply(v, x, train=False)
    d = tr.model.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))


def test_rand_augment_ops_preserve_contract():
    from bsyolo_tpu.data.photometric import rand_augment

    img = (np.random.default_rng(0).uniform(0, 255, (64, 64, 3))).astype(np.uint8)
    for seed in range(16):  # sweep ops
        out = rand_augment(img.copy(), np.random.default_rng(seed))
        assert out.shape == img.shape and out.dtype == np.uint8


def test_val_plots_artifacts(data_yaml, tmp_path):
    """val(plots=True) writes the reference's artifact set: confusion matrix,
    PR/P/R/F1 curves, and the first val batches as labels/pred tiles."""
    from bsyolo_tpu import YOLO

    m = YOLO(TINY)
    m._new(TINY, img_size=64)
    m.val(data=str(data_yaml), batch=8, imgsz=64, conf=0.001, plots=True,
          save_dir=str(tmp_path / "out"))
    names = {p.name for p in (tmp_path / "out").glob("*")}
    for expect in ("confusion_matrix.png", "PR_curve.png", "F1_curve.png",
                   "P_curve.png", "R_curve.png", "val_batch0_labels.jpg",
                   "val_batch0_pred.jpg"):
        assert expect in names, f"missing val artifact {expect}"


def test_rect_val_buckets(tmp_path):
    """rect=True val: images group into static aspect buckets (wide/square/
    tall canvases), metrics match square val on the same data, and wrap-pad
    duplicate rows are excluded from stats (im_idx sentinel)."""
    import cv2

    from bsyolo_tpu import YOLO
    from bsyolo_tpu.data import DataLoader, YOLODataset

    rng = np.random.default_rng(0)
    root = tmp_path / "ds"
    (root / "images/val").mkdir(parents=True)
    (root / "labels/val").mkdir(parents=True)
    # 3 wide (48x96), 3 square (64x64), 1 tall (96x48) -> uneven buckets
    shapes = [(48, 96)] * 3 + [(64, 64)] * 3 + [(96, 48)]
    for i, (h, w) in enumerate(shapes):
        img = rng.integers(30, 70, (h, w, 3)).astype(np.uint8)
        img[h // 4 : 3 * h // 4, w // 4 : 3 * w // 4] = [225, 215, 205]
        cv2.imwrite(str(root / "images/val" / f"{i}.jpg"), img)
        (root / "labels/val" / f"{i}.txt").write_text("0 0.5 0.5 0.5 0.5\n")
    (root / "data.yaml").write_text(
        f"path: {root}\ntrain: images/val\nval: images/val\nnc: 1\nnames:\n  0: sq\n"
    )

    ds = YOLODataset(str(root / "images/val"), imgsz=64, augment=False, max_gt=8)
    loader = DataLoader(ds, 2, shuffle=False, drop_last=False, rect=True)
    canvases = set()
    seen = []
    for b in loader:
        canvases.add(b["img"].shape[1:3])
        seen += [int(k) for k in b["im_idx"] if k >= 0]
    # short edge snaps to the /32 grid: floor(64*0.75/32)*32 = 32
    assert canvases == {(32, 64), (64, 64), (64, 32)}, canvases
    assert sorted(seen) == list(range(7)), seen  # every image exactly once

    m = YOLO(TINY)
    m._new(TINY, img_size=64)
    r_sq = m.val(data=str(root / "data.yaml"), batch=2, imgsz=64, conf=0.001)
    r_rect = m.val(data=str(root / "data.yaml"), batch=2, imgsz=64, conf=0.001, rect=True)
    # untrained model: both paths must at least agree that metrics compute;
    # on a trained model the boxes land identically up to resize rounding
    assert np.isfinite(r_rect.box.map50) and np.isfinite(r_sq.box.map50)


def test_tail_wrap_rows_excluded_from_stats(tmp_path):
    """drop_last=False tail padding must NOT double-count images (im_idx=-1
    rows skipped): 3 images at batch 2 -> exactly 3 target_cls entries."""
    import cv2

    from bsyolo_tpu.data import DataLoader, YOLODataset

    root = tmp_path / "ds"
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir(parents=True)
    for i in range(3):
        cv2.imwrite(str(root / "images" / f"{i}.jpg"),
                    np.full((64, 64, 3), 100, np.uint8))
        (root / "labels" / f"{i}.txt").write_text("0 0.5 0.5 0.5 0.5\n")
    ds = YOLODataset(str(root / "images"), imgsz=64, augment=False, max_gt=8)
    loader = DataLoader(ds, 2, shuffle=False, drop_last=False)
    rows = []
    for b in loader:
        assert "im_idx" in b
        rows += [int(k) for k in b["im_idx"]]
    assert rows == [0, 1, 2, -1]


class TestChunkedDispatch:
    def _setup(self, k=3):
        import jax.numpy as jnp

        from bsyolo_tpu.engine.optim import OptimConfig
        from bsyolo_tpu.engine.train_step import (
            StepConfig, init_train_state, make_chunked_train_step, make_train_step,
        )
        from bsyolo_tpu.losses import DetectionLossConfig
        from bsyolo_tpu.nn import build_model, load_model_yaml, parse_model_yaml

        spec = parse_model_yaml(load_model_yaml(TINY), scale="")
        model, variables = build_model(spec, img_size=64)
        B, M = 4, 6
        cfg = StepConfig(
            loss=DetectionLossConfig(nc=2, strides=spec.head_strides),
            optim=OptimConfig(name="SGD", lr0=1e-2, epochs=1, nbs=B),
            batch_size=B, nb=k, nw=0, use_adamw=False, weight_decay=1e-4,
        )
        g = np.random.default_rng(11)
        n_valid = (np.arange(B) % (M - 1)) + 1
        batches = {
            "img": g.uniform(0, 1, (k, B, 64, 64, 3)).astype(np.float32),
            "cls": g.integers(0, 2, (k, B, M)).astype(np.int32),
            "bboxes": np.concatenate(
                [g.uniform(0.3, 0.7, (k, B, M, 2)), g.uniform(0.1, 0.25, (k, B, M, 2))], -1
            ).astype(np.float32),
            "mask": np.broadcast_to(
                (np.arange(M)[None] < n_valid[:, None]).astype(np.float32), (k, B, M)
            ).copy(),
        }
        step = make_train_step(model, cfg)
        chunk = make_chunked_train_step(model, cfg)
        return init_train_state, variables, step, chunk, batches, jnp

    def test_chunk_scan_matches_sequential_steps(self):
        """make_chunked_train_step(K) == K make_train_step calls: same final
        params/EMA/step and per-step loss metrics (the scan carries the exact
        same TrainState transition)."""
        import jax

        init_train_state, variables, step, chunk, batches, jnp = self._setup(k=3)

        s_seq = init_train_state(variables)
        seq_losses = []
        for i in range(3):
            s_seq, m = step(s_seq, {k2: jnp.asarray(v[i]) for k2, v in batches.items()})
            seq_losses.append(float(m["loss"]))

        s_ch = init_train_state(variables)
        s_ch, mc = chunk(s_ch, {k2: jnp.asarray(v) for k2, v in batches.items()})

        np.testing.assert_allclose(np.asarray(mc["loss"]), seq_losses, rtol=1e-5)
        assert int(s_ch.step) == int(s_seq.step) == 3
        for a, b in zip(jax.tree_util.tree_leaves(s_seq.params),
                        jax.tree_util.tree_leaves(s_ch.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7)
        for a, b in zip(jax.tree_util.tree_leaves(s_seq.ema_params),
                        jax.tree_util.tree_leaves(s_ch.ema_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7)


def test_trainer_chunked_run_with_tail(data_yaml, tmp_path):
    """Trainer with chunk_steps=4 over 16 imgs / batch 8 / 2 steps per epoch:
    the tail path (epoch shorter than a chunk) trains every batch; losses
    finite and a checkpoint lands."""
    from bsyolo_tpu.engine.trainer import DetectionTrainer

    t = DetectionTrainer(overrides=_overrides(data_yaml, tmp_path, chunk_steps=4, epochs=2))
    t.train()
    assert int(t.state.step) == 4  # 2 epochs x 2 steps: every batch trained
    assert np.isfinite(t.epoch_metrics["train/loss"])
    assert (tmp_path / "runs" / "t" / "weights" / "last.ckpt").exists()


def test_profile_flag_writes_xprof_trace(data_yaml, tmp_path):
    """profile=True captures a post-compile xprof trace into save_dir/profile
    (SURVEY §5.1 TPU mapping of the reference's inert profile flag)."""
    from bsyolo_tpu.engine.trainer import DetectionTrainer

    t = DetectionTrainer(overrides=_overrides(data_yaml, tmp_path, profile=True, epochs=1))
    t.train()
    prof = tmp_path / "runs" / "t" / "profile"
    traces = list(prof.rglob("*.xplane.pb")) + list(prof.rglob("*.trace.json.gz"))
    assert traces, f"no trace files under {prof}"
