"""Golden parity for the TAL assigner and the fork's detection loss."""

import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax.numpy as jnp

import ref_oracle


def _make_inputs(rng, b=2, nc=12, reg_max=16, sizes=((16, 16), (8, 8), (4, 4)), strides=(8, 16, 32), M=8):
    no = nc + reg_max * 4
    feats = [rng.normal(0, 1, size=(b, h, w, no)).astype(np.float32) for h, w in sizes]
    imgsz = sizes[0][0] * strides[0]
    # random gt in normalized xywh with some rows masked off
    cx = rng.uniform(0.2, 0.8, (b, M))
    cy = rng.uniform(0.2, 0.8, (b, M))
    w = rng.uniform(0.05, 0.3, (b, M))
    h = rng.uniform(0.05, 0.3, (b, M))
    boxes = np.stack([cx, cy, w, h], -1).astype(np.float32)
    cls = rng.integers(0, nc, (b, M)).astype(np.int32)
    nvalid = rng.integers(1, M + 1, (b,))
    mask = (np.arange(M)[None] < nvalid[:, None]).astype(np.float32)
    boxes = boxes * mask[..., None]
    cls = (cls * mask).astype(np.int32)
    return feats, cls, boxes, mask, imgsz


def _ref_loss_modules(nc, reg_max, strides, nwd=True, iou_ratio=0.6, topk=10):
    import torch

    ns = ref_oracle.loss("v8DetectionLoss", "EMASlideLoss", "BboxLoss", "DFLoss", "SlideLoss")
    ns["autocast"] = lambda enabled=True: torch.autocast("cpu", enabled=False)
    ns["wasserstein_loss"] = ref_oracle.tal("wasserstein_loss")["wasserstein_loss"]

    class FakeDetect(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.nc = nc
            self.reg_max = reg_max
            self.no = nc + reg_max * 4
            self.stride = torch.tensor([float(s) for s in strides])

    class FakeModel(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.p = torch.nn.Parameter(torch.zeros(1))
            self.model = torch.nn.ModuleList([FakeDetect()])
            self.args = SimpleNamespace(
                box=7.5, cls=0.5, dfl=1.5, nwdloss=nwd, iou_ratio=iou_ratio
            )

    return ns["v8DetectionLoss"](FakeModel(), tal_topk=topk)


class TestTALGolden:
    def test_assignment_matches_reference(self, rng):
        import torch

        nc, M, A = 12, 8, 336
        b = 2
        ns = ref_oracle.tal("TaskAlignedAssigner", "make_anchors")
        assigner = ns["TaskAlignedAssigner"](topk=10, num_classes=nc, alpha=0.5, beta=6.0)

        pd_scores = rng.uniform(0, 1, (b, A, nc)).astype(np.float32)
        anc = rng.uniform(0, 128, (A, 2)).astype(np.float32)
        wh = rng.uniform(4, 40, (b, A, 4)).astype(np.float32)
        pd_boxes = np.concatenate([anc[None] - wh[..., :2], anc[None] + wh[..., 2:]], -1)
        gt_xy = rng.uniform(10, 100, (b, M, 2)).astype(np.float32)
        gt_wh = rng.uniform(10, 60, (b, M, 2)).astype(np.float32)
        gt_boxes = np.concatenate([gt_xy, gt_xy + gt_wh], -1)
        gt_labels = rng.integers(0, nc, (b, M, 1)).astype(np.int64)
        mask = (np.arange(M)[None, :, None] < 5).astype(np.float32) * np.ones((b, M, 1), np.float32)

        tl, tb, ts, fg, tgi = assigner(
            torch.from_numpy(pd_scores),
            torch.from_numpy(pd_boxes),
            torch.from_numpy(anc),
            torch.from_numpy(gt_labels),
            torch.from_numpy(gt_boxes),
            torch.from_numpy(mask),
        )

        from bsyolo_tpu.losses import task_aligned_assign

        res = task_aligned_assign(
            jnp.asarray(pd_scores),
            jnp.asarray(pd_boxes),
            jnp.asarray(anc),
            jnp.asarray(gt_labels[..., 0]),
            jnp.asarray(gt_boxes),
            jnp.asarray(mask[..., 0]),
            topk=10,
            num_classes=nc,
            alpha=0.5,
            beta=6.0,
        )
        np.testing.assert_array_equal(np.asarray(res.fg_mask), fg.numpy())
        np.testing.assert_allclose(np.asarray(res.target_scores), ts.numpy(), rtol=1e-4, atol=1e-5)
        got_tb = np.asarray(res.target_bboxes) * np.asarray(res.fg_mask)[..., None]
        ref_tb = tb.numpy() * fg.numpy()[..., None]
        np.testing.assert_allclose(got_tb, ref_tb, rtol=1e-4, atol=1e-4)


class TestDetectionLossGolden:
    @pytest.mark.parametrize("nwd", [True, False])
    def test_loss_matches_reference(self, rng, nwd):
        import torch

        nc, reg_max = 12, 16
        strides = (8, 16, 32)
        feats, cls, boxes, mask, imgsz = _make_inputs(rng, nc=nc, reg_max=reg_max, strides=strides)
        crit = _ref_loss_modules(nc, reg_max, strides, nwd=nwd)

        # reference batch: ragged (n, ...) tensors with batch_idx
        bidx, rows = np.nonzero(mask)
        batch = {
            "batch_idx": torch.from_numpy(bidx.astype(np.float32)),
            "cls": torch.from_numpy(cls[bidx, rows].astype(np.float32)),
            "bboxes": torch.from_numpy(boxes[bidx, rows]),
        }
        feats_t = [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats]
        ref_total, ref_items = crit(feats_t, batch)

        from bsyolo_tpu.losses import DetectionLossConfig, detection_loss, init_loss_state

        cfg = DetectionLossConfig(nc=nc, strides=strides, nwd_loss=nwd, iou_ratio=0.6)
        total, items, new_state = detection_loss(
            [jnp.asarray(f) for f in feats],
            jnp.asarray(cls),
            jnp.asarray(boxes),
            jnp.asarray(mask),
            init_loss_state(),
            cfg,
        )
        np.testing.assert_allclose(np.asarray(items), ref_items.numpy(), rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(float(total), float(ref_total), rtol=2e-3)
        assert int(new_state.updates) == 1

    def test_state_evolves_like_reference(self, rng):
        """iou_mean decays toward 0.2 exactly as the reference EMA (loss.py:81-87)."""
        from bsyolo_tpu.losses import DetectionLossConfig, detection_loss, init_loss_state
        import math

        nc = 4
        feats, cls, boxes, mask, _ = _make_inputs(rng, nc=nc)
        cfg = DetectionLossConfig(nc=nc, strides=(8, 16, 32))
        state = init_loss_state()
        expected = 1.0
        for t in range(1, 4):
            _, _, state = detection_loss(
                [jnp.asarray(f) for f in feats],
                jnp.asarray(cls),
                jnp.asarray(boxes),
                jnp.asarray(mask),
                state,
                cfg,
            )
            d = 0.4 * (1 - math.exp(-t / 2000))
            expected = d * expected + (1 - d) * 0.2
            assert float(state.iou_mean) == pytest.approx(expected, rel=1e-5)


class TestTALBf16:
    def test_bf16_assignment_agrees_with_f32(self):
        """assigner_bf16 halves the (b, M, A) HBM traffic of the stop-gradient
        assignment; selection may flip only on bf16-level near-ties, so on
        random (tie-free) geometry the fg set must agree almost everywhere and
        target values must stay full-precision where both agree."""
        from bsyolo_tpu.losses import task_aligned_assign

        rng = np.random.default_rng(42)  # own stream: the shared session rng
        # makes thresholds order-dependent
        nc, M, A, b = 12, 8, 336, 4
        pd_scores = rng.uniform(0, 1, (b, A, nc)).astype(np.float32)
        anc = rng.uniform(0, 128, (A, 2)).astype(np.float32)
        wh = rng.uniform(4, 40, (b, A, 4)).astype(np.float32)
        pd_boxes = np.concatenate([anc[None] - wh[..., :2], anc[None] + wh[..., 2:]], -1)
        gt_xy = rng.uniform(10, 100, (b, M, 2)).astype(np.float32)
        gt_wh = rng.uniform(10, 60, (b, M, 2)).astype(np.float32)
        gt_boxes = np.concatenate([gt_xy, gt_xy + gt_wh], -1)
        gt_labels = rng.integers(0, nc, (b, M)).astype(np.int64)
        mask = (np.arange(M)[None, :] < 5).astype(np.float32) * np.ones((b, M), np.float32)

        args = (jnp.asarray(pd_scores), jnp.asarray(pd_boxes), jnp.asarray(anc),
                jnp.asarray(gt_labels), jnp.asarray(gt_boxes), jnp.asarray(mask))
        kw = dict(topk=10, num_classes=nc, alpha=0.5, beta=6.0)
        r32 = task_aligned_assign(*args, **kw)
        r16 = task_aligned_assign(*args, bf16=True, **kw)

        fg32 = np.asarray(r32.fg_mask)
        fg16 = np.asarray(r16.fg_mask)
        agree = (fg32 == fg16).mean()
        assert agree > 0.995, f"fg_mask agreement {agree}"
        # outputs stay f32 typed and full-precision where the selection agrees
        assert r16.target_scores.dtype == jnp.float32
        both = fg32 & fg16 & (np.asarray(r32.target_gt_idx) == np.asarray(r16.target_gt_idx))
        np.testing.assert_array_equal(
            np.asarray(r32.target_bboxes)[both], np.asarray(r16.target_bboxes)[both]
        )
        # target-score weights: the per-gt normalization maxes over every
        # positive row covering the anchor, so a bf16 tie-flip in ANOTHER
        # row can move an agreeing anchor's weight — bound the bulk, not
        # every element
        ts32 = np.asarray(r32.target_scores)[both]
        ts16 = np.asarray(r16.target_scores)[both]
        close = np.isclose(ts16, ts32, rtol=0.02, atol=1e-3)
        assert close.mean() > 0.95, f"only {close.mean():.3f} of weights close"
        assert np.mean(np.abs(ts16 - ts32)) < 0.01

    def test_loss_runs_with_bf16_assigner(self, rng):
        """detection_loss(assigner_bf16=True) stays finite and close to the
        f32-assigner loss on a realistic batch."""
        from bsyolo_tpu.losses import DetectionLossConfig, detection_loss, init_loss_state

        nc, M = 8, 16
        feats = [jnp.asarray(rng.normal(0, 1, (2, s, s, 64 + nc)).astype(np.float32))
                 for s in (12, 6, 3)]
        cls = jnp.asarray(rng.integers(0, nc, (2, M)).astype(np.int32))
        boxes = jnp.asarray(np.concatenate(
            [rng.uniform(0.3, 0.7, (2, M, 2)), rng.uniform(0.1, 0.3, (2, M, 2))], -1
        ).astype(np.float32))
        mask = jnp.asarray((np.arange(M)[None] < 6).astype(np.float32).repeat(2, 0))
        base = DetectionLossConfig(nc=nc, strides=(8, 16, 32))
        t32, _, _ = detection_loss(feats, cls, boxes, mask, init_loss_state(), base)
        t16, _, _ = detection_loss(
            feats, cls, boxes, mask, init_loss_state(), base._replace(assigner_bf16=True)
        )
        assert np.isfinite(float(t16))
        np.testing.assert_allclose(float(t16), float(t32), rtol=0.05)
