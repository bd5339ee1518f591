"""Unit tests for the ops substrate, including golden parity vs the reference.

The reference implementation (PyTorch) is importable read-only from
/root/reference; where available we compare numerics directly.
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from bsyolo_tpu.ops import (
    bbox2dist,
    bbox_iou,
    box_iou_pairwise,
    dist2bbox,
    inner_iou,
    letterbox_image,
    make_anchors,
    non_max_suppression,
    scale_boxes,
    wasserstein_loss,
    xywh2xyxy,
    xyxy2xywh,
)

import ref_oracle


def rand_boxes(rng, n, scale=100.0, fmt="xyxy"):
    xy = rng.uniform(5, scale, size=(n, 2))
    wh = rng.uniform(1, scale / 3, size=(n, 2))
    if fmt == "xyxy":
        return np.concatenate([xy, xy + wh], -1).astype(np.float32)
    return np.concatenate([xy + wh / 2, wh], -1).astype(np.float32)


class TestConversions:
    def test_roundtrip(self, rng):
        b = rand_boxes(rng, 64, fmt="xywh")
        out = np.asarray(xyxy2xywh(xywh2xyxy(jnp.asarray(b))))
        np.testing.assert_allclose(out, b, rtol=1e-5, atol=1e-4)

    def test_dist2bbox_roundtrip(self, rng):
        anchors = jnp.asarray(rng.uniform(5, 75, size=(32, 2)).astype(np.float32))
        dist = jnp.asarray(rng.uniform(0, 10, size=(32, 4)).astype(np.float32))
        boxes = dist2bbox(dist, anchors, xywh=False)
        back = bbox2dist(anchors, boxes, reg_max=16)
        np.testing.assert_allclose(np.asarray(back), np.asarray(dist), rtol=1e-5, atol=1e-4)

    def test_make_anchors(self):
        anchors, strides = make_anchors([(4, 4), (2, 2)], [8, 16])
        assert anchors.shape == (20, 2)
        assert strides.shape == (20, 1)
        np.testing.assert_allclose(np.asarray(anchors[0]), [0.5, 0.5])
        np.testing.assert_allclose(np.asarray(strides[-1]), [16.0])


class TestIoUGolden:
    """Numerics parity vs the reference bbox_iou (metrics.py:87-164)."""

    @pytest.mark.parametrize(
        "flags",
        [
            {},
            {"GIoU": True},
            {"DIoU": True},
            {"CIoU": True},
            {"SIoU": True},
            {"MDPIoU": True},
            {"CIoU": True, "Inner_iou": True},
        ],
    )
    @pytest.mark.parametrize("xywh", [True, False])
    def test_bbox_iou_matches_reference(self, rng, flags, xywh):
        import torch

        ref_ns = ref_oracle.metrics("bbox_iou")
        b1 = rand_boxes(rng, 128, fmt="xywh" if xywh else "xyxy")
        b2 = rand_boxes(rng, 128, fmt="xywh" if xywh else "xyxy")
        ref_flags = dict(flags)
        if "SIoU" in ref_flags:  # reference spells it SIOU
            ref_flags["SIOU"] = ref_flags.pop("SIoU")
        ref = ref_ns["bbox_iou"](torch.from_numpy(b1), torch.from_numpy(b2), xywh=xywh, **ref_flags)
        got = bbox_iou(jnp.asarray(b1), jnp.asarray(b2), xywh=xywh, **flags)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-5)

    def test_inner_iou_matches_reference(self, rng):
        import torch

        ref_ns = ref_oracle.metrics("inner_iou")
        b1 = rand_boxes(rng, 64, fmt="xywh")
        b2 = rand_boxes(rng, 64, fmt="xywh")
        ref = ref_ns["inner_iou"](torch.from_numpy(b1), torch.from_numpy(b2), xywh=True)
        got = inner_iou(jnp.asarray(b1), jnp.asarray(b2), xywh=True)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-5)

    def test_wasserstein_matches_reference(self, rng):
        import torch

        ref_ns = ref_oracle.tal("wasserstein_loss")
        b1 = rand_boxes(rng, 64, fmt="xyxy")
        b2 = rand_boxes(rng, 64, fmt="xyxy")
        ref = ref_ns["wasserstein_loss"](torch.from_numpy(b1), torch.from_numpy(b2))
        got = wasserstein_loss(jnp.asarray(b1), jnp.asarray(b2))
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-5)

    def test_pairwise_identity(self, rng):
        b = rand_boxes(rng, 16)
        m = np.asarray(box_iou_pairwise(jnp.asarray(b), jnp.asarray(b)))
        np.testing.assert_allclose(np.diag(m), np.ones(16), rtol=1e-4)


class TestNMS:
    def test_suppresses_duplicates(self):
        # Two near-identical boxes of class 0 + one distinct box of class 1
        boxes = np.array(
            [
                [50, 50, 20, 20],
                [51, 50, 20, 20],
                [200, 200, 30, 30],
            ],
            dtype=np.float32,
        )
        scores = np.array(
            [[0.9, 0.0], [0.8, 0.0], [0.0, 0.7]],
            dtype=np.float32,
        )
        pred = np.concatenate([boxes, scores], -1)[None]  # (1, 3, 6)
        out = np.asarray(non_max_suppression(jnp.asarray(pred), conf_thres=0.25, pre_k=8, max_det=4))
        kept = out[0][out[0][:, 4] > 0]
        assert len(kept) == 2
        assert kept[0][4] == pytest.approx(0.9, abs=1e-5)
        assert set(kept[:, 5].astype(int)) == {0, 1}

    def test_class_offset_keeps_overlapping_other_class(self):
        boxes = np.array([[50, 50, 20, 20], [50, 50, 20, 20]], dtype=np.float32)
        scores = np.array([[0.9, 0.0], [0.0, 0.8]], dtype=np.float32)
        pred = np.concatenate([boxes, scores], -1)[None]
        out = np.asarray(non_max_suppression(jnp.asarray(pred), conf_thres=0.25, pre_k=8))
        kept = out[0][out[0][:, 4] > 0]
        assert len(kept) == 2  # same box, different classes -> both kept

    def test_greedy_chain(self):
        # Chain: A suppresses B, B would suppress C, A does not overlap C
        # Greedy keeps A and C. (Fast-NMS would wrongly drop C only if B kept.)
        boxes = np.array(
            [[0, 0, 10, 10], [4, 0, 14, 10], [8, 0, 18, 10]], dtype=np.float32
        )
        boxes_xywh = np.asarray(xyxy2xywh(jnp.asarray(boxes)))
        scores = np.array([[0.9], [0.8], [0.7]], dtype=np.float32)
        pred = np.concatenate([boxes_xywh, scores], -1)[None]
        out = np.asarray(
            non_max_suppression(jnp.asarray(pred), conf_thres=0.1, iou_thres=0.3, pre_k=8)
        )
        kept = out[0][out[0][:, 4] > 0]
        assert len(kept) == 2
        np.testing.assert_allclose(sorted(kept[:, 4]), [0.7, 0.9], atol=1e-6)

    def test_matches_greedy_oracle(self, rng):
        """Golden check against an O(n^2) numpy greedy NMS on random boxes."""
        n = 200
        boxes = rand_boxes(rng, n, scale=300.0, fmt="xyxy")
        scores = rng.uniform(0.05, 1.0, size=(n,)).astype(np.float32)
        ref_keep = ref_oracle.numpy_greedy_nms(boxes, scores, 0.5)
        ref_kept = set(ref_keep.tolist())

        pred = np.concatenate(
            [np.asarray(xyxy2xywh(jnp.asarray(boxes))), scores[:, None]], -1
        )[None]
        out = np.asarray(
            non_max_suppression(
                jnp.asarray(pred), conf_thres=0.0, iou_thres=0.5, pre_k=256, max_det=256
            )
        )
        got = out[0][out[0][:, 4] > 0]
        got_scores = sorted(got[:, 4].tolist())
        ref_scores = sorted(scores[sorted(ref_kept)].tolist())
        assert len(got_scores) == len(ref_scores)
        np.testing.assert_allclose(got_scores, ref_scores, rtol=1e-5)


class TestLetterbox:
    def test_shapes_and_ratio(self, rng):
        im = (rng.uniform(0, 255, size=(480, 640, 3))).astype(np.uint8)
        out, r, (dw, dh) = letterbox_image(im, (640, 640))
        assert out.shape == (640, 640, 3)
        assert r == pytest.approx(1.0)
        assert dh == pytest.approx(80.0)

    def test_matches_reference_letterbox(self, rng):
        LetterBox = ref_oracle.letterbox_cls()

        im = (rng.uniform(0, 255, size=(317, 423, 3))).astype(np.uint8)
        ref = LetterBox(new_shape=(640, 640))(image=im.copy())
        got, _, _ = letterbox_image(im, (640, 640))
        np.testing.assert_array_equal(got, ref)

    def test_scale_boxes_roundtrip(self):
        # box in 640-letterboxed space for a 480x640 original
        boxes = jnp.asarray([[100.0, 180.0, 200.0, 280.0]])
        out = np.asarray(scale_boxes((640, 640), boxes, (480, 640)))
        np.testing.assert_allclose(out, [[100.0, 100.0, 200.0, 200.0]], atol=0.5)
