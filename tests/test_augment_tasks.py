"""Point-payload augmentation parity vs the reference (round-4 item #3).

The reference warps polygons, keypoints, and OBB corners through
Mosaic/RandomPerspective (augment.py:952-1300, v8_transforms:2275). These
tests drive our label-warp math and the AST-extracted reference class with
the SAME affine matrix and assert identical outputs, then check the e2e
dataset paths produce geometrically consistent samples.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))

from ref_oracle import random_perspective_cls  # noqa: E402


def _rand_M(rng, w=160, h=160, perspective=0.0005):
    """A plausible mosaic-style affine: rotation+scale+shear+translate."""
    import math

    import cv2

    C = np.eye(3, dtype=np.float32)
    C[0, 2], C[1, 2] = -w, -h  # center of a 2x canvas
    P = np.eye(3, dtype=np.float32)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)
    R = np.eye(3, dtype=np.float32)
    s = rng.uniform(0.5, 1.5)
    R[:2] = cv2.getRotationMatrix2D(angle=rng.uniform(-25, 25), center=(0, 0), scale=s)
    S = np.eye(3, dtype=np.float32)
    S[0, 1] = math.tan(rng.uniform(-3, 3) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-3, 3) * math.pi / 180)
    T = np.eye(3, dtype=np.float32)
    T[0, 2] = rng.uniform(0.4, 0.6) * w
    T[1, 2] = rng.uniform(0.4, 0.6) * h
    return (T @ S @ R @ P @ C).astype(np.float32), s


class TestWarpParity:
    """warp_instance_labels == reference apply_segments/apply_keypoints/
    box_candidates for the same M."""

    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    def test_segments(self, seed):
        from bsyolo_tpu.data.augment import warp_instance_labels

        rng = np.random.default_rng(seed)
        w = h = 160
        M, s = _rand_M(rng, w, h)
        n, k = 7, 40
        # polygons scattered around (and partially outside) the canvas
        centers = rng.uniform(-40, 200, (n, 1, 2))
        pts = (centers + rng.uniform(-30, 30, (n, k, 2))).astype(np.float32)
        boxes = np.concatenate([pts.min(1), pts.max(1)], -1).astype(np.float32)
        cls = np.arange(n, dtype=np.float32)

        RP = random_perspective_cls()
        rp = RP()
        rp.size = (w, h)
        rp.perspective = 0.0005
        ref_boxes, ref_segs = rp.apply_segments(pts.copy(), M)
        ref_boxes = np.asarray(ref_boxes, np.float32)
        ref_clip = ref_boxes.copy()
        ref_clip[:, [0, 2]] = ref_clip[:, [0, 2]].clip(0, w)
        ref_clip[:, [1, 3]] = ref_clip[:, [1, 3]].clip(0, h)
        sc = boxes.copy() * s
        ref_keep = rp.box_candidates(box1=sc.T, box2=ref_clip.T, area_thr=0.01)

        out_cls, out_boxes, out_pts, _ = warp_instance_labels(
            cls, boxes.copy(), pts.copy(), None, M, s, (w, h), 0.0005, "segment"
        )
        np.testing.assert_array_equal(out_cls, cls[ref_keep])
        np.testing.assert_allclose(out_boxes, ref_clip[ref_keep], atol=1e-3)
        np.testing.assert_allclose(out_pts, ref_segs[ref_keep], atol=1e-3)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_keypoints(self, seed):
        from bsyolo_tpu.data.augment import warp_instance_labels

        rng = np.random.default_rng(seed + 10)
        w = h = 160
        M, s = _rand_M(rng, w, h, perspective=0.0)
        n, k = 6, 5
        kxy = rng.uniform(-20, 180, (n, k, 2)).astype(np.float32)
        vis = (rng.random((n, k)) > 0.3).astype(np.float32) * 2
        boxes = np.concatenate([kxy.min(1) - 5, kxy.max(1) + 5], -1).astype(np.float32)
        cls = np.zeros(n, np.float32)

        RP = random_perspective_cls()
        rp = RP()
        rp.size = (w, h)
        rp.perspective = 0.0
        ref_b = np.asarray(rp.apply_bboxes(boxes.copy(), M), np.float32)
        ref_k = rp.apply_keypoints(
            np.concatenate([kxy, vis[..., None]], -1).copy(), M
        )
        # reference then clips via Instances.clip (boxes + kpt coords)
        ref_b[:, [0, 2]] = ref_b[:, [0, 2]].clip(0, w)
        ref_b[:, [1, 3]] = ref_b[:, [1, 3]].clip(0, h)
        ref_kc = ref_k.copy()
        ref_kc[..., 0] = ref_kc[..., 0].clip(0, w)
        ref_kc[..., 1] = ref_kc[..., 1].clip(0, h)
        ref_keep = rp.box_candidates(box1=(boxes * s).T, box2=ref_b.T, area_thr=0.10)

        out_cls, out_boxes, out_pts, out_vis = warp_instance_labels(
            cls, boxes.copy(), kxy.copy(), vis.copy(), M, s, (w, h), 0.0, "pose"
        )
        np.testing.assert_allclose(out_boxes, ref_b[ref_keep], atol=1e-3)
        np.testing.assert_allclose(out_pts, ref_kc[ref_keep][..., :2], atol=1e-3)
        np.testing.assert_allclose(out_vis, ref_kc[ref_keep][..., 2], atol=0)

    def test_segment2box_matches_reference(self):
        from ref_oracle import _extract

        from bsyolo_tpu.data.augment import segment2box

        ref = _extract("ultralytics/utils/ops.py", ("segment2box",))["segment2box"]
        rng = np.random.default_rng(3)
        for _ in range(20):
            seg = rng.uniform(-80, 240, (25, 2)).astype(np.float32)
            np.testing.assert_allclose(
                segment2box(seg, 160, 160), np.asarray(ref(seg, 160, 160)), atol=1e-5
            )

    def test_resample_poly_matches_reference(self):
        from ref_oracle import _extract

        from bsyolo_tpu.data.augment import resample_poly

        ref = _extract("ultralytics/utils/ops.py", ("resample_segments",))["resample_segments"]
        rng = np.random.default_rng(4)
        for m, n in [(5, 37), (8, 1000), (40, 12), (13, 13)]:
            poly = rng.uniform(0, 100, (m, 2)).astype(np.float32)
            np.testing.assert_allclose(
                resample_poly(poly, n), ref([poly.copy()], n=n)[0], atol=1e-4
            )


def _mk_ds(tmp_path, task, label_text, n=6, size=96):
    from PIL import Image

    root = tmp_path / f"ds_{task}"
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 255, (size, size, 3)).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"{i}.jpg")
        (root / "labels" / f"{i}.txt").write_text(label_text)
    return str(root / "images")


class TestTaskMosaicSamples:
    """The e2e dataset paths keep labels geometrically consistent through the
    full mosaic/affine pipeline."""

    def test_segment_masks_inside_boxes(self, tmp_path):
        from bsyolo_tpu.data import YOLODataset

        # a diamond polygon
        txt = "0 0.5 0.25 0.25 0.5 0.5 0.75 0.75 0.5\n1 0.1 0.1 0.3 0.1 0.3 0.3 0.1 0.3\n"
        ds = YOLODataset(_mk_ds(tmp_path, "segment", txt), imgsz=64, augment=True,
                         hyp={"mosaic": 1.0, "scale": 0.5}, max_gt=16, task="segment")
        hits = 0
        for seed in range(8):
            s = ds.get_sample(0, np.random.default_rng(seed))
            masks = s["masks"]
            valid = s["mask"] > 0
            n = int(valid.sum())
            assert masks.max() <= n, "mask indices exceed instance count"
            ms = masks.shape[0]
            for g in range(n):
                ys, xs = np.nonzero(masks == g + 1)
                if len(xs) == 0:
                    continue
                hits += 1
                cx, cy, bw, bh = s["bboxes"][g] * 64  # canvas px
                x1, y1 = (cx - bw / 2) / 4, (cy - bh / 2) / 4  # mask px (ratio 4)
                x2, y2 = (cx + bw / 2) / 4, (cy + bh / 2) / 4
                assert xs.min() >= x1 - 1.5 and xs.max() <= x2 + 1.5, (seed, g)
                assert ys.min() >= y1 - 1.5 and ys.max() <= y2 + 1.5, (seed, g)
        assert hits >= 8, "mosaic pipeline produced almost no rasterized instances"

    def test_segment_mask_area_sorted(self, tmp_path):
        """Overlap encoding paints big instances first (reference
        polygons2masks_overlap): the small inner square must survive."""
        from bsyolo_tpu.data import YOLODataset

        txt = ("0 0.1 0.1 0.9 0.1 0.9 0.9 0.1 0.9\n"  # big square
               "1 0.4 0.4 0.6 0.4 0.6 0.6 0.4 0.6\n")  # small square inside it
        ds = YOLODataset(_mk_ds(tmp_path, "segment_sorted", txt), imgsz=64,
                         augment=False, max_gt=8, task="segment")
        s = ds.get_sample(0, np.random.default_rng(0), mosaic=False)
        masks, cls = s["masks"], s["cls"]
        # both instances present, smaller one on top (its id occupies pixels)
        assert (masks == 1).any() and (masks == 2).any()
        # index 1 is the larger-area instance => class 0 first after sorting
        assert cls[0] == 0 and cls[1] == 1
        area1, area2 = (masks == 1).sum(), (masks == 2).sum()
        assert area1 > area2

    def test_pose_keypoints_inside_boxes(self, tmp_path):
        from bsyolo_tpu.data import YOLODataset

        txt = "0 0.5 0.5 0.4 0.4 0.40 0.40 2 0.60 0.60 2 0.50 0.45 2\n"
        ds = YOLODataset(_mk_ds(tmp_path, "pose", txt), imgsz=64, augment=True,
                         hyp={"mosaic": 1.0, "scale": 0.5}, max_gt=16, task="pose",
                         flip_idx=[0, 1, 2])
        checked = 0
        for seed in range(8):
            s = ds.get_sample(0, np.random.default_rng(seed))
            valid = s["mask"] > 0
            k = s["keypoints"]
            for g in np.nonzero(valid)[0]:
                cx, cy, bw, bh = s["bboxes"][g]
                vis = k[g][:, 2] > 0
                if not vis.any():
                    continue
                checked += 1
                # visible keypoints lie within the (slightly padded) box
                assert (np.abs(k[g][vis, 0] - cx) <= bw / 2 + 0.06).all(), (seed, g)
                assert (np.abs(k[g][vis, 1] - cy) <= bh / 2 + 0.06).all(), (seed, g)
        assert checked >= 6

    def test_obb_rboxes_track_corners(self, tmp_path):
        from bsyolo_tpu.data import YOLODataset

        # a rotated rectangle (diamond-ish quad)
        txt = "0 0.50 0.30 0.70 0.50 0.50 0.70 0.30 0.50\n"
        ds = YOLODataset(_mk_ds(tmp_path, "obb", txt), imgsz=64, augment=True,
                         hyp={"mosaic": 1.0, "scale": 0.3, "degrees": 20.0},
                         max_gt=16, task="obb")
        found = 0
        for seed in range(10):
            s = ds.get_sample(0, np.random.default_rng(seed))
            valid = s["mask"] > 0
            for g in np.nonzero(valid)[0]:
                rb = s["rboxes"][g]
                cx, cy, bw, bh = s["bboxes"][g]
                found += 1
                # rbox center ~ box center (loose: clipped corners shift the
                # minAreaRect center off the inside-point AABB center, as in
                # the reference); rbox fits inside the AABB diagonal
                assert abs(rb[0] - cx) < 0.12 and abs(rb[1] - cy) < 0.12, (seed, g)
                diag = np.hypot(bw, bh)
                assert rb[2] <= diag + 0.03 and rb[3] <= diag + 0.03
                assert -np.pi / 4 - 1e-6 <= rb[4] < 3 * np.pi / 4 + 1e-6
        assert found >= 8

    def test_close_mosaic_respected(self, tmp_path):
        """mosaic=False reaches the task samplers (single-image affine)."""
        from bsyolo_tpu.data import YOLODataset

        txt = "0 0.5 0.25 0.25 0.5 0.5 0.75 0.75 0.5\n"
        ds = YOLODataset(_mk_ds(tmp_path, "seg_cm", txt), imgsz=64, augment=True,
                         hyp={"mosaic": 1.0, "translate": 0.0, "scale": 0.0},
                         max_gt=8, task="segment")
        s = ds.get_sample(0, np.random.default_rng(0), mosaic=False)
        # identity affine on a letterboxed single image: exactly one instance
        assert int((s["mask"] > 0).sum()) == 1
