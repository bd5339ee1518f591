"""Training-step integration tests: overfit a tiny model on synthetic data,
and run the same step sharded over the virtual 8-device mesh."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

TINY = str(Path(__file__).parent / "fixtures" / "tiny.yaml")


def synthetic_batch(rng, b=8, size=64, M=4):
    """Images with one bright square each; gt = the square's box."""
    imgs = rng.uniform(0, 0.2, (b, size, size, 3)).astype(np.float32)
    boxes = np.zeros((b, M, 4), np.float32)
    cls = np.zeros((b, M), np.int32)
    mask = np.zeros((b, M), np.float32)
    for i in range(b):
        w = int(rng.integers(12, 24))
        x0 = int(rng.integers(4, size - w - 4))
        y0 = int(rng.integers(4, size - w - 4))
        imgs[i, y0 : y0 + w, x0 : x0 + w, :] = 1.0
        boxes[i, 0] = [(x0 + w / 2) / size, (y0 + w / 2) / size, w / size, w / size]
        cls[i, 0] = 0
        mask[i, 0] = 1.0
    return {
        "img": jnp.asarray(imgs),
        "cls": jnp.asarray(cls),
        "bboxes": jnp.asarray(boxes),
        "mask": jnp.asarray(mask),
    }


@pytest.fixture(scope="module")
def tiny_setup():
    from bsyolo_tpu.nn import load_model_yaml, parse_model_yaml, build_model
    from bsyolo_tpu.losses import DetectionLossConfig
    from bsyolo_tpu.engine.optim import OptimConfig
    from bsyolo_tpu.engine.train_step import StepConfig, init_train_state, make_train_step

    d = load_model_yaml(TINY)
    spec = parse_model_yaml(d)
    model, variables = build_model(spec, img_size=64)
    loss_cfg = DetectionLossConfig(nc=spec.nc, strides=spec.head_strides)
    opt_cfg = OptimConfig(name="SGD", lr0=0.02, epochs=10, warmup_epochs=0.5, nbs=8)
    step_cfg = StepConfig(
        loss=loss_cfg,
        optim=opt_cfg,
        batch_size=8,
        nb=10,
        nw=5,
        use_adamw=False,
        weight_decay=0.0005,
    )
    step = make_train_step(model, step_cfg)
    # the step donates its input state, so each test makes a fresh one
    make_state = lambda: init_train_state(variables)
    return model, spec, step, make_state


class TestTrainStep:
    def test_loss_decreases_and_localizes(self, tiny_setup, rng):
        from bsyolo_tpu.nn.heads import decode_detections
        from bsyolo_tpu.ops import non_max_suppression
        from bsyolo_tpu.ops.boxes import box_iou_pairwise, xywh2xyxy

        model, spec, step, make_state = tiny_setup
        state = make_state()
        batch = synthetic_batch(rng)
        losses = []
        # loss VALUE rises early as assignments firm up (target scores start
        # near zero under the TAL normalization), then falls — compare to peak
        for i in range(300):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        peak = np.max(losses[:50])
        last = np.mean(losses[-10:])
        assert last < peak * 0.25, f"loss did not drop from peak: {peak:.1f} -> {last:.1f}"

        # localize: top detection must overlap the true square
        feats = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["img"],
            train=False,
        )
        preds = decode_detections(feats, spec.head_strides, spec.nc)
        dets = np.asarray(non_max_suppression(preds, conf_thres=0.01, max_det=4))
        gt_xyxy = np.asarray(xywh2xyxy(batch["bboxes"][:, 0] * 64))
        ious = []
        for i in range(dets.shape[0]):
            if dets[i, 0, 4] > 0:
                iou = np.asarray(
                    box_iou_pairwise(jnp.asarray(dets[i, :1, :4]), jnp.asarray(gt_xyxy[i : i + 1]))
                )[0, 0]
                ious.append(iou)
        assert len(ious) >= 6, "most images should have a confident detection"
        assert np.mean(ious) > 0.5, f"mean IoU too low: {np.mean(ious)}"

    def test_ema_and_counters(self, tiny_setup, rng):
        model, spec, step, make_state = tiny_setup
        batch = synthetic_batch(rng)
        s1, m1 = step(make_state(), batch)
        assert int(m1["updated"]) == 1  # first step always applies
        assert int(s1.ema_updates) == 1
        assert int(s1.loss_state.updates) == 1


class TestDataParallel:
    def test_sharded_step_matches_semantics(self, rng):
        """Same step under an 8-device data mesh: runs, stays finite, and the
        replicated params remain identical across devices."""
        from bsyolo_tpu.nn import load_model_yaml, parse_model_yaml, build_model
        from bsyolo_tpu.losses import DetectionLossConfig
        from bsyolo_tpu.engine.optim import OptimConfig
        from bsyolo_tpu.engine.train_step import StepConfig, init_train_state, make_train_step
        from bsyolo_tpu.parallel import make_mesh, shard_batch, replicated_sharding

        assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
        mesh = make_mesh(8)

        d = load_model_yaml(TINY)
        spec = parse_model_yaml(d)
        model, variables = build_model(spec, img_size=64)
        step_cfg = StepConfig(
            loss=DetectionLossConfig(nc=spec.nc, strides=spec.head_strides),
            optim=OptimConfig(name="SGD", lr0=0.01, epochs=2, nbs=16),
            batch_size=16,
            nb=4,
            nw=2,
            use_adamw=False,
            weight_decay=0.0005,
        )
        step = make_train_step(model, step_cfg)
        state = init_train_state(variables)
        state = jax.device_put(state, replicated_sharding(mesh))
        batch = shard_batch(synthetic_batch(rng, b=16), mesh)

        state, metrics = step(state, batch)
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        # params stay replicated (no divergence across devices)
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        assert leaf.sharding.is_fully_replicated


class TestRemat:
    """cfg remat=True (jax.checkpoint nothing_saveable around the model
    forward) must be a pure schedule change: identical loss, grads, and
    updated params vs the default step."""

    def test_remat_step_equals_plain(self, tiny_setup, rng):
        from bsyolo_tpu.engine.optim import OptimConfig
        from bsyolo_tpu.engine.train_step import StepConfig, make_train_step
        from bsyolo_tpu.losses import DetectionLossConfig

        model, spec, _, make_state = tiny_setup
        batch = synthetic_batch(rng)
        cfg = StepConfig(
            loss=DetectionLossConfig(nc=spec.nc, strides=spec.head_strides),
            optim=OptimConfig(name="SGD", lr0=0.02, epochs=10, warmup_epochs=0.5, nbs=8),
            batch_size=8, nb=10, nw=5, use_adamw=False, weight_decay=0.0005,
        )
        plain = make_train_step(model, cfg)
        s1, m1 = plain(make_state(), batch)
        # both remat schedules (full recompute; segment-boundary checkpoints)
        # must be pure schedule changes: same loss, same updated params
        for mode in (True, "seg", "light"):
            remat = make_train_step(model, cfg._replace(remat=mode))
            s2, m2 = remat(make_state(), batch)
            np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
            for a, b in zip(
                jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
            ):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_remat_mode_validation(self):
        from bsyolo_tpu.engine.train_step import remat_policy

        assert remat_policy(False) is None and remat_policy("") is None
        assert remat_policy(True) is not None and remat_policy("full") is not None
        assert remat_policy("seg") is not None
        assert remat_policy("light") is not None
        with pytest.raises(ValueError):
            remat_policy("bogus")


class TestUint8Batches:
    """Loader batches ship uint8 RGB; the compiled step normalizes on device
    (ops.normalize_image_batch). Pins uint8/f32 equivalence end-to-end."""

    def test_normalize_helper(self):
        from bsyolo_tpu.ops import normalize_image_batch

        u = jnp.asarray(np.arange(0, 256, 5, np.uint8).reshape(1, 4, 13, 1))
        f = normalize_image_batch(u)
        assert f.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(f), np.asarray(u) / 255.0)
        # float passes through untouched (no double divide)
        same = normalize_image_batch(f)
        assert same is f

    def test_uint8_step_equals_f32_step(self, tiny_setup, rng):
        model, spec, step, make_state = tiny_setup
        fbatch = synthetic_batch(rng)
        u8 = dict(fbatch)
        # exactly representable: f32 batch quantized to the uint8 grid
        q = np.round(np.asarray(fbatch["img"]) * 255.0).astype(np.uint8)
        u8["img"] = jnp.asarray(q)
        fbatch = dict(fbatch)
        fbatch["img"] = jnp.asarray(q.astype(np.float32) / 255.0)

        s1, m1 = step(make_state(), fbatch)
        s2, m2 = step(make_state(), u8)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
        a = jax.tree_util.tree_leaves(s1.params)[0]
        b = jax.tree_util.tree_leaves(s2.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
