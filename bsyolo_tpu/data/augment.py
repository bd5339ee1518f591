"""Host-side training augmentations.

NumPy/cv2 ports of the reference train pipeline (ultralytics/data/augment.py
v8_transforms:2275): Mosaic(4) -> RandomPerspective(with LetterBox pre) ->
RandomHSV -> RandomFlip. Augmentation is inherently ragged (variable label
counts) and image-IO-bound, so it stays on host; the device graph starts at
the padded, batched tensors produced by `format_labels`.

All randomness flows through a numpy Generator passed explicitly — per-epoch
determinism mirrors the reference's seeded workers (data/build.py:127-145).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from bsyolo_tpu.ops.letterbox import letterbox_image


def resample_poly(poly: np.ndarray, n: int) -> np.ndarray:
    """Re-sample a closed polygon to exactly ``n`` points.

    Mirrors reference ops.resample_segments (utils/ops.py:620): close the
    ring, then linearly interpolate; when up-sampling the original vertices
    are kept and new points inserted between them.
    """
    poly = np.asarray(poly, np.float32)
    if len(poly) == n:
        return poly
    s = np.concatenate([poly, poly[:1]], 0)
    xp = np.arange(len(s), dtype=np.float32)
    if len(s) < n:
        x = np.linspace(0, len(s) - 1, n - len(s))
        x = np.insert(x, np.searchsorted(x, xp), xp)
    else:
        x = np.linspace(0, len(s) - 1, n)
    return np.stack([np.interp(x, xp, s[:, k]) for k in range(2)], -1).astype(np.float32)


def segment2box(seg: np.ndarray, w: float, h: float) -> np.ndarray:
    """Tight xyxy box over a polygon's inside-canvas points (reference
    utils/ops.py:65 segment2box, incl. the 3-sides-outside pre-clip)."""
    x, y = seg.T
    if int(x.min() < 0) + int(y.min() < 0) + int(x.max() > w) + int(y.max() > h) >= 3:
        x = x.clip(0, w)
        y = y.clip(0, h)
    inside = (x >= 0) & (y >= 0) & (x <= w) & (y <= h)
    x, y = x[inside], y[inside]
    if x.size == 0 or not x.any():
        return np.zeros(4, np.float32)
    return np.array([x.min(), y.min(), x.max(), y.max()], np.float32)


def random_hsv(img: np.ndarray, rng: np.random.Generator, hgain=0.015, sgain=0.7, vgain=0.4):
    """HSV jitter via LUTs (reference augment.py:1303-1380 RandomHSV)."""
    if hgain or sgain or vgain:
        r = rng.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
        hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
        dtype = img.dtype
        x = np.arange(0, 256, dtype=r.dtype)
        lut_hue = ((x * r[0]) % 180).astype(dtype)
        lut_sat = np.clip(x * r[1], 0, 255).astype(dtype)
        lut_val = np.clip(x * r[2], 0, 255).astype(dtype)
        im_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val)))
        img = cv2.cvtColor(im_hsv, cv2.COLOR_HSV2BGR)
    return img


def random_flip(img, boxes_xyxy, rng, fliplr=0.5, flipud=0.0, pts=None, vis=None,
                flip_idx=None):
    """Horizontal/vertical flips (reference augment.py:1383-1460).

    ``pts``/``vis`` mirror Instances.fliplr/flipud (all coords flipped,
    visibility untouched); ``flip_idx`` reorders left/right keypoints on
    horizontal flips (reference RandomFlip flip_idx handling).
    Returns (img, boxes) when pts is None, else (img, boxes, pts, vis).
    """
    h, w = img.shape[:2]
    if flipud and rng.random() < flipud:
        img = np.flipud(img)
        y1 = boxes_xyxy[:, 1].copy()
        boxes_xyxy[:, 1] = h - boxes_xyxy[:, 3]
        boxes_xyxy[:, 3] = h - y1
        if pts is not None:
            pts[..., 1] = h - pts[..., 1]
    if fliplr and rng.random() < fliplr:
        img = np.fliplr(img)
        x1 = boxes_xyxy[:, 0].copy()
        boxes_xyxy[:, 0] = w - boxes_xyxy[:, 2]
        boxes_xyxy[:, 2] = w - x1
        if pts is not None:
            pts[..., 0] = w - pts[..., 0]
            if flip_idx is not None and len(pts) and pts.shape[1] == len(flip_idx):
                pts = np.ascontiguousarray(pts[:, flip_idx])
                if vis is not None:
                    vis = np.ascontiguousarray(vis[:, flip_idx])
    if pts is None:
        return np.ascontiguousarray(img), boxes_xyxy
    return np.ascontiguousarray(img), boxes_xyxy, pts, vis


def mosaic4(
    images: List[np.ndarray],
    labels: List[Tuple],  # [(cls (n,), xyxy-pixel (n,4)[, pts (n,K,2), vis (n,K)|None]), ...] x4
    imgsz: int,
    rng: np.random.Generator,
):
    """4-way mosaic on a 2x canvas (reference augment.py:490-620 Mosaic._mosaic4).

    Label tuples may carry an optional per-instance point payload (polygon /
    keypoint / OBB-corner coordinates) plus visibility; points get the same
    (padw, padh) offset and 2s-canvas clip the reference applies via
    Instances.add_padding / _cat_labels' clip. Return arity follows input
    arity: (img, cls, boxes, border) or (img, cls, boxes, pts, vis, border).
    """
    s = imgsz
    has_pts = len(labels[0]) > 2
    border = (-s // 2, -s // 2)
    yc = int(rng.uniform(-border[0], 2 * s + border[0]))
    xc = int(rng.uniform(-border[1], 2 * s + border[1]))
    img4 = np.full((s * 2, s * 2, images[0].shape[2]), 114, dtype=np.uint8)
    out_cls, out_boxes, out_pts, out_vis = [], [], [], []
    for i in range(4):
        img = images[i]
        h, w = img.shape[:2]
        if i == 0:  # top left
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
        elif i == 1:  # top right
            x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
            x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
        elif i == 2:  # bottom left
            x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
        else:  # bottom right
            x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
        img4[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
        padw, padh = x1a - x1b, y1a - y1b
        cls, boxes = labels[i][0], labels[i][1]
        if len(boxes):
            b = boxes.copy()
            b[:, [0, 2]] += padw
            b[:, [1, 3]] += padh
            out_cls.append(cls)
            out_boxes.append(b)
            if has_pts:
                p = labels[i][2].copy()
                p[..., 0] += padw
                p[..., 1] += padh
                out_pts.append(p)
                # vis must stay row-aligned with pts: a vis-less tile in a
                # mixed payload contributes all-zero (invisible) rows
                out_vis.append(
                    labels[i][3] if labels[i][3] is not None
                    else np.zeros(p.shape[:2], np.float32)
                )
    cls = np.concatenate(out_cls) if out_cls else np.zeros((0,), np.float32)
    boxes = np.concatenate(out_boxes) if out_boxes else np.zeros((0, 4), np.float32)
    boxes = np.clip(boxes, 0, 2 * s)
    if not has_pts:
        return img4, cls, boxes, border
    k = labels[0][2].shape[1] if labels[0][2].ndim == 3 else 0
    pts = np.concatenate(out_pts) if out_pts else np.zeros((0, k, 2), np.float32)
    pts = np.clip(pts, 0, 2 * s)  # reference _cat_labels: instances.clip(2s, 2s)
    vis = (np.concatenate(out_vis) if out_vis else np.zeros((0, k), np.float32)) \
        if any(l[3] is not None for l in labels) else None
    return img4, cls, boxes, pts, vis, border


def mosaic9(
    images: List[np.ndarray],
    labels: List[Tuple],
    imgsz: int,
    rng: np.random.Generator,
):
    """9-way mosaic on a 3x canvas (reference augment.py Mosaic._mosaic9).

    Same optional point-payload contract as :func:`mosaic4`.
    """
    s = imgsz
    has_pts = len(labels[0]) > 2
    canvas = np.full((s * 3, s * 3, images[0].shape[2]), 114, dtype=np.uint8)
    out_cls, out_boxes, out_pts, out_vis = [], [], [], []
    h0 = w0 = 0  # center image dims
    hp = wp = 0  # previous image dims
    for i in range(9):
        img = images[i]
        h, w = img.shape[:2]
        if i == 0:  # center
            h0, w0 = h, w
            c = (s, s, s + w, s + h)
        elif i == 1:  # top
            c = (s, s - h, s + w, s)
        elif i == 2:  # top right
            c = (s + wp, s - h, s + wp + w, s)
        elif i == 3:  # right
            c = (s + w0, s, s + w0 + w, s + h)
        elif i == 4:  # bottom right
            c = (s + w0, s + hp, s + w0 + w, s + hp + h)
        elif i == 5:  # bottom
            c = (s + w0 - w, s + h0, s + w0, s + h0 + h)
        elif i == 6:  # bottom left
            c = (s + w0 - wp - w, s + h0, s + w0 - wp, s + h0 + h)
        elif i == 7:  # left
            c = (s - w, s + h0 - h, s, s + h0)
        else:  # top left
            c = (s - w, s + h0 - hp - h, s, s + h0 - hp)
        x1, y1 = (max(v, 0) for v in c[:2])
        x2, y2 = min(c[2], 3 * s), min(c[3], 3 * s)
        if x2 > x1 and y2 > y1:
            canvas[y1:y2, x1:x2] = img[
                (y1 - c[1]) : (y1 - c[1]) + (y2 - y1), (x1 - c[0]) : (x1 - c[0]) + (x2 - x1)
            ]
            cls, boxes = labels[i][0], labels[i][1]
            if len(boxes):
                b = boxes.copy()
                b[:, [0, 2]] += c[0]
                b[:, [1, 3]] += c[1]
                out_cls.append(cls)
                out_boxes.append(b)
                if has_pts:
                    p = labels[i][2].copy()
                    p[..., 0] += c[0]
                    p[..., 1] += c[1]
                    out_pts.append(p)
                    # row-aligned with pts even when a tile lacks vis
                    out_vis.append(
                        labels[i][3] if labels[i][3] is not None
                        else np.zeros(p.shape[:2], np.float32)
                    )
        hp, wp = h, w
    # crop a 2s x 2s window at a random offset (must fit the 3s canvas)
    yc = int(rng.uniform(0, s))
    xc = int(rng.uniform(0, s))
    canvas = canvas[yc : yc + 2 * s, xc : xc + 2 * s]
    cls = np.concatenate(out_cls) if out_cls else np.zeros((0,), np.float32)
    boxes = np.concatenate(out_boxes) if out_boxes else np.zeros((0, 4), np.float32)
    k = labels[0][2].shape[1] if has_pts and labels[0][2].ndim == 3 else 0
    pts = (np.concatenate(out_pts) if out_pts else np.zeros((0, k, 2), np.float32)) if has_pts else None
    vis = None
    if has_pts and any(l[3] is not None for l in labels):
        vis = np.concatenate(out_vis) if out_vis else np.zeros((0, k), np.float32)
    if len(boxes):
        boxes[:, [0, 2]] -= xc
        boxes[:, [1, 3]] -= yc
        boxes = np.clip(boxes, 0, 2 * s)
        keep = ((boxes[:, 2] - boxes[:, 0]) > 2) & ((boxes[:, 3] - boxes[:, 1]) > 2)
        cls, boxes = cls[keep], boxes[keep]
        if has_pts:
            pts[..., 0] -= xc
            pts[..., 1] -= yc
            pts = np.clip(pts[keep], 0, 2 * s)
            vis = vis[keep] if vis is not None else None
    if not has_pts:
        return canvas, cls, boxes, (-s // 2, -s // 2)
    return canvas, cls, boxes, pts, vis, (-s // 2, -s // 2)


def mixup(img1, labels1, img2, labels2, rng: np.random.Generator):
    """Beta(32, 32) image blend + label union (reference augment.py:867 MixUp)."""
    r = rng.beta(32.0, 32.0)
    img = (img1.astype(np.float32) * r + img2.astype(np.float32) * (1 - r)).astype(img1.dtype)
    cls = np.concatenate([labels1[0], labels2[0]])
    boxes = np.concatenate([labels1[1], labels2[1]])
    return img, cls, boxes


def copy_paste(img, cls, boxes, rng: np.random.Generator, p: float = 0.5, donor=None):
    """Copy-paste augmentation (reference augment.py:1634 CopyPaste).

    flip mode (donor=None): horizontally mirror a subset of this image's
    boxes and paste the mirrored pixels. mixup mode (donor=(dimg, dcls,
    dboxes), reference copy_paste_mode="mixup"/_mix_transform): paste box
    regions from ANOTHER training image at their own coordinates instead.
    Both gate each paste on IoA < 0.30 against all current boxes."""
    if donor is not None:
        dimg, dcls, dboxes = donor
        if len(dboxes) == 0:
            return img, cls, boxes
        h, w = img.shape[:2]
        n = max(1, int(len(dboxes) * p))
        sel = rng.choice(len(dboxes), n, replace=False)
        new_cls, new_boxes = [cls] if len(cls) else [], [boxes] if len(boxes) else []
        img = img.copy()
        for j in sel:
            x1 = int(np.clip(dboxes[j, 0], 0, w - 1))
            y1 = int(np.clip(dboxes[j, 1], 0, h - 1))
            x2 = int(np.clip(dboxes[j, 2], 0, w))
            y2 = int(np.clip(dboxes[j, 3], 0, h))
            if x2 <= x1 or y2 <= y1:
                continue
            if new_boxes:
                cur = np.concatenate(new_boxes)
                iw = np.minimum(cur[:, 2], x2) - np.maximum(cur[:, 0], x1)
                ih = np.minimum(cur[:, 3], y2) - np.maximum(cur[:, 1], y1)
                inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
                area = (cur[:, 2] - cur[:, 0]) * (cur[:, 3] - cur[:, 1]) + 1e-9
                if (inter / area >= 0.30).any():
                    continue
            img[y1:y2, x1:x2] = dimg[y1:y2, x1:x2]
            new_cls.append(np.asarray(dcls[j : j + 1]))
            new_boxes.append(np.asarray([[x1, y1, x2, y2]], np.float32))
        if not new_boxes:
            return img, cls, boxes
        return img, np.concatenate(new_cls), np.concatenate(new_boxes)
    if len(boxes) == 0 or p <= 0:
        return img, cls, boxes
    h, w = img.shape[:2]
    n = max(1, int(len(boxes) * p))
    sel = rng.choice(len(boxes), n, replace=False)
    new_cls, new_boxes = [cls], [boxes]
    img = img.copy()
    for j in sel:
        x1, y1, x2, y2 = (int(v) for v in boxes[j])
        mx1, mx2 = w - x2, w - x1
        if mx2 <= mx1 or x2 <= x1 or y2 <= y1:
            continue
        # skip if the mirrored location overlaps an existing box heavily:
        # IoA (intersection over existing-box area) must stay < 0.30 against
        # ALL current boxes, matching reference augment.py:1715-1716.
        cur = np.concatenate(new_boxes)
        iw = np.minimum(cur[:, 2], mx2) - np.maximum(cur[:, 0], mx1)
        ih = np.minimum(cur[:, 3], y2) - np.maximum(cur[:, 1], y1)
        inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
        area = (cur[:, 2] - cur[:, 0]) * (cur[:, 3] - cur[:, 1]) + 1e-9
        if (inter / area >= 0.30).any():
            continue
        img[y1:y2, mx1:mx2] = np.fliplr(img[y1:y2, x1:x2])
        new_cls.append(cls[j : j + 1])
        new_boxes.append(np.asarray([[mx1, y1, mx2, y2]], np.float32))
    return img, np.concatenate(new_cls), np.concatenate(new_boxes)


def random_perspective(
    img: np.ndarray,
    cls: np.ndarray,
    boxes_xyxy: np.ndarray,
    rng: np.random.Generator,
    degrees=0.0,
    translate=0.1,
    scale=0.5,
    shear=0.0,
    perspective=0.0,
    border=(0, 0),
    pts: Optional[np.ndarray] = None,
    vis: Optional[np.ndarray] = None,
    kind: str = "detect",
):
    """Affine warp + label transform + candidate filter (augment.py:952-1300).

    ``pts`` (n, K, 2) carries per-instance points through the warp:
    - kind="segment"/"obb": polygon / corner points; boxes are RE-DERIVED
      from the warped points' inside-canvas extent (reference apply_segments
      + segment2box, augment.py:1110-1148) and points clipped to their box;
      candidate filter uses area_thr=0.01 (augment.py:1253).
    - kind="pose": keypoints; warped coords with visibility zeroed outside
      the canvas (reference apply_keypoints, augment.py:1150-1183), then
      coords clipped (Instances.clip); boxes via the 4-corner transform.
    Returns (img, cls, boxes) when pts is None, else (img, cls, boxes, pts, vis).
    """
    size = (img.shape[1] + border[1] * 2, img.shape[0] + border[0] * 2)

    C = np.eye(3, dtype=np.float32)
    C[0, 2] = -img.shape[1] / 2
    C[1, 2] = -img.shape[0] / 2
    P = np.eye(3, dtype=np.float32)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)
    R = np.eye(3, dtype=np.float32)
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
    S = np.eye(3, dtype=np.float32)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    T = np.eye(3, dtype=np.float32)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * size[0]
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * size[1]
    M = T @ S @ R @ P @ C

    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            img = cv2.warpPerspective(img, M, dsize=size, borderValue=(114, 114, 114))
        else:
            img = cv2.warpAffine(img, M[:2], dsize=size, borderValue=(114, 114, 114))

    if len(boxes_xyxy):
        cls, boxes_xyxy, pts, vis = warp_instance_labels(
            cls, boxes_xyxy, pts, vis, M, s, size, perspective, kind
        )
    if pts is None and vis is None and kind == "detect":
        return img, cls, boxes_xyxy
    return img, cls, boxes_xyxy, pts, vis


def warp_instance_labels(cls, boxes_xyxy, pts, vis, M, s, size, perspective, kind):
    """Label side of RandomPerspective given the affine matrix M: transform
    boxes/points, re-derive boxes from warped points for segment/obb, zero
    out-of-canvas keypoint visibility, clip, candidate-filter. Mirrors
    reference apply_bboxes/apply_segments/apply_keypoints + box_candidates
    (augment.py:1086-1300); split out so parity tests can drive it with a
    fixed M."""
    n = len(boxes_xyxy)
    new_pts, new_vis = pts, vis
    if pts is not None and kind in ("segment", "obb"):
        # warp the points, then re-derive boxes from their inside-canvas
        # extent (reference apply_segments); clip points to their box
        k = pts.shape[1]
        xy = np.ones((n * k, 3), dtype=np.float32)
        xy[:, :2] = pts.reshape(-1, 2)
        xy = xy @ M.T
        new_pts = (xy[:, :2] / xy[:, 2:3]).reshape(n, k, 2)
        new = np.stack([segment2box(p, size[0], size[1]) for p in new_pts], 0)
        new_pts[..., 0] = new_pts[..., 0].clip(new[:, 0:1], new[:, 2:3])
        new_pts[..., 1] = new_pts[..., 1].clip(new[:, 1:2], new[:, 3:4])
        area_thr = 0.01
    else:
        xy = np.ones((n * 4, 3), dtype=np.float32)
        xy[:, :2] = boxes_xyxy[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n * 4, 2)
        xy = xy @ M.T
        xy = (xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]).reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        new = np.concatenate((x.min(1), y.min(1), x.max(1), y.max(1))).reshape(4, n).T
        area_thr = 0.1
        if pts is not None:  # pose keypoints
            k = pts.shape[1]
            kxy = np.ones((n * k, 3), dtype=np.float32)
            kxy[:, :2] = pts.reshape(-1, 2)
            kxy = kxy @ M.T
            kxy = kxy[:, :2] / kxy[:, 2:3]
            out = (kxy[:, 0] < 0) | (kxy[:, 1] < 0) | (kxy[:, 0] > size[0]) | (kxy[:, 1] > size[1])
            new_vis = None if vis is None else np.where(out.reshape(n, k), 0.0, vis)
            new_pts = kxy.reshape(n, k, 2)
            new_pts[..., 0] = new_pts[..., 0].clip(0, size[0])
            new_pts[..., 1] = new_pts[..., 1].clip(0, size[1])
    new[:, [0, 2]] = new[:, [0, 2]].clip(0, size[0])
    new[:, [1, 3]] = new[:, [1, 3]].clip(0, size[1])
    # candidate filter (reference box_candidates, augment.py:1280-1300;
    # area_thr 0.01 with segments, 0.10 otherwise — augment.py:1253)
    w1 = boxes_xyxy[:, 2] - boxes_xyxy[:, 0]
    h1 = boxes_xyxy[:, 3] - boxes_xyxy[:, 1]
    w2 = new[:, 2] - new[:, 0]
    h2 = new[:, 3] - new[:, 1]
    ar = np.maximum(w2 / (h2 + 1e-16), h2 / (w2 + 1e-16))
    keep = (w2 > 2) & (h2 > 2) & (w2 * h2 / (w1 * h1 * s * s + 1e-16) > area_thr) & (ar < 100)
    out_pts = new_pts[keep] if pts is not None else None
    out_vis = new_vis[keep] if (pts is not None and new_vis is not None) else None
    return cls[keep], new[keep], out_pts, out_vis


def train_transform(
    imgs: List[np.ndarray],
    labels: List[Tuple[np.ndarray, np.ndarray]],
    imgsz: int,
    rng: np.random.Generator,
    hyp: Optional[Dict] = None,
    mosaic: bool = True,
):
    """Full train-time pipeline for ONE output sample from 4 source images.

    Returns (img uint8 HWC, cls (n,), boxes xyxy pixels (n, 4)).
    """
    hyp = hyp or {}
    if mosaic and len(imgs) >= 9 and rng.random() < hyp.get("mosaic9", 0.0):
        img, cls, boxes, border = mosaic9(imgs[:9], labels[:9], imgsz, rng)
    elif mosaic and len(imgs) >= 4:
        img, cls, boxes, border = mosaic4(imgs[:4], labels[:4], imgsz, rng)
    else:
        img0 = imgs[0]
        cls, boxes = labels[0]
        img, r, (dw, dh) = letterbox_image(img0, (imgsz, imgsz), scaleup=True)
        boxes = boxes * r
        boxes[:, [0, 2]] += dw
        boxes[:, [1, 3]] += dh
        border = (0, 0)
    img, cls, boxes = random_perspective(
        img,
        cls,
        boxes,
        rng,
        degrees=hyp.get("degrees", 0.0),
        translate=hyp.get("translate", 0.1),
        scale=hyp.get("scale", 0.5),
        shear=hyp.get("shear", 0.0),
        perspective=hyp.get("perspective", 0.0),
        border=border,
    )
    if hyp.get("copy_paste", 0.0) > 0 and rng.random() < hyp.get("copy_paste", 0.0):
        donor = None
        if str(hyp.get("copy_paste_mode", "flip")) == "mixup" and len(imgs) > 1:
            # donor = one of the other random source images, letterboxed to
            # this canvas (the reference draws one extra dataset sample;
            # mosaic sources ARE random dataset samples, so reuse one)
            k = int(rng.integers(1, len(imgs)))
            dimg, (dcls, dboxes) = imgs[k], labels[k]
            dimg, r, (dw, dh) = letterbox_image(dimg, img.shape[:2], scaleup=True)
            dboxes = dboxes * r
            dboxes[:, [0, 2]] += dw
            dboxes[:, [1, 3]] += dh
            donor = (dimg, dcls, dboxes)
        img, cls, boxes = copy_paste(img, cls, boxes, rng, donor=donor)
    from bsyolo_tpu.data.photometric import photometric_suite

    # Albumentations-analog photometric suite (reference augment.py:1735;
    # applied before HSV like the reference v8_transforms ordering)
    img = photometric_suite(img, rng, p=hyp.get("albumentations", 1.0))
    img = random_hsv(
        img, rng, hyp.get("hsv_h", 0.015), hyp.get("hsv_s", 0.7), hyp.get("hsv_v", 0.4)
    )
    img, boxes = random_flip(
        img, boxes, rng, fliplr=hyp.get("fliplr", 0.5), flipud=hyp.get("flipud", 0.0)
    )
    # NOTE: the `bgr` channel-swap is NOT applied here — the reference applies
    # it once in Format AFTER MixUp (augment.py Format/bgr), so the dataset
    # applies it after blending (dataset.py); rolling it per-component would
    # let MixUp blend a swapped image with an unswapped one.
    return img, cls, boxes


def train_transform_task(
    imgs: List[np.ndarray],
    labels: List[Tuple],  # [(cls, boxes_xyxy_px, pts (n,K,2) px, vis (n,K)|None), ...]
    imgsz: int,
    rng: np.random.Generator,
    hyp: Optional[Dict] = None,
    mosaic: bool = True,
    kind: str = "segment",
    flip_idx: Optional[np.ndarray] = None,
):
    """Full train pipeline for tasks with per-instance point payloads
    (segment polygons / pose keypoints / OBB corners), mirroring the
    reference v8_transforms order (augment.py:2275): Mosaic ->
    RandomPerspective -> photometric -> HSV -> flips, with points warped
    through every geometric stage.

    Returns (img uint8 HWC, cls (n,), boxes xyxy px (n,4), pts (n,K,2) px,
    vis (n,K)|None).
    """
    hyp = hyp or {}
    if mosaic and len(imgs) >= 9 and rng.random() < hyp.get("mosaic9", 0.0):
        img, cls, boxes, pts, vis, border = mosaic9(imgs[:9], labels[:9], imgsz, rng)
    elif mosaic and len(imgs) >= 4:
        img, cls, boxes, pts, vis, border = mosaic4(imgs[:4], labels[:4], imgsz, rng)
    else:
        img0 = imgs[0]
        cls, boxes, pts, vis = labels[0]
        img, r, (dw, dh) = letterbox_image(img0, (imgsz, imgsz), scaleup=True)
        boxes = boxes * r
        boxes[:, [0, 2]] += dw
        boxes[:, [1, 3]] += dh
        pts = pts * r
        pts[..., 0] += dw
        pts[..., 1] += dh
        border = (0, 0)
    img, cls, boxes, pts, vis = random_perspective(
        img, cls, boxes, rng,
        degrees=hyp.get("degrees", 0.0),
        translate=hyp.get("translate", 0.1),
        scale=hyp.get("scale", 0.5),
        shear=hyp.get("shear", 0.0),
        perspective=hyp.get("perspective", 0.0),
        border=border, pts=pts, vis=vis, kind=kind,
    )
    from bsyolo_tpu.data.photometric import photometric_suite

    img = photometric_suite(img, rng, p=hyp.get("albumentations", 1.0))
    img = random_hsv(
        img, rng, hyp.get("hsv_h", 0.015), hyp.get("hsv_s", 0.7), hyp.get("hsv_v", 0.4)
    )
    fliplr = hyp.get("fliplr", 0.5)
    if kind == "pose" and flip_idx is None:
        # reference v8_transforms:2323-2326 — no flip_idx => no hflip for pose
        fliplr = 0.0
    img, boxes, pts, vis = random_flip(
        img, boxes, rng, fliplr=fliplr, flipud=hyp.get("flipud", 0.0),
        pts=pts, vis=vis, flip_idx=flip_idx,
    )
    return img, cls, boxes, pts, vis


def mixup_task(img1, labels1, img2, labels2, rng: np.random.Generator):
    """MixUp for point-payload tasks: Beta(32,32) blend + payload union
    (reference augment.py:867 MixUp over Instances.concatenate)."""
    r = rng.beta(32.0, 32.0)
    img = (img1.astype(np.float32) * r + img2.astype(np.float32) * (1 - r)).astype(img1.dtype)
    cls = np.concatenate([labels1[0], labels2[0]])
    boxes = np.concatenate([labels1[1], labels2[1]])
    pts = np.concatenate([labels1[2], labels2[2]])
    vis = None
    if labels1[3] is not None and labels2[3] is not None:
        vis = np.concatenate([labels1[3], labels2[3]])
    return img, cls, boxes, pts, vis


def format_labels(img: np.ndarray, cls: np.ndarray, boxes_xyxy: np.ndarray, max_gt: int):
    """Pad ragged labels into fixed (max_gt,) tensors; normalize boxes to xywh.

    Replaces the reference's ragged collate (dataset.py:232 collate_fn) with
    static shapes for XLA. The image comes back as uint8 RGB — NOT f32/255
    like the reference's host-side preprocess (trainer.py ``.float()/255``):
    batches ship to the device at 1/4 the bytes and the compiled step
    normalizes via ops.normalize_image_batch (fused into the first conv).
    """
    h, w = img.shape[:2]
    n = min(len(cls), max_gt)
    out_cls = np.zeros((max_gt,), np.int32)
    out_box = np.zeros((max_gt, 4), np.float32)
    out_mask = np.zeros((max_gt,), np.float32)
    if n:
        b = boxes_xyxy[:n].astype(np.float32)
        cx = (b[:, 0] + b[:, 2]) / 2 / w
        cy = (b[:, 1] + b[:, 3]) / 2 / h
        bw = (b[:, 2] - b[:, 0]) / w
        bh = (b[:, 3] - b[:, 1]) / h
        out_box[:n] = np.stack([cx, cy, bw, bh], -1)
        out_cls[:n] = cls[:n].astype(np.int32)
        out_mask[:n] = 1.0
    if img.ndim == 2:
        img = img[..., None].repeat(3, -1)
    return np.ascontiguousarray(img[..., ::-1]), out_cls, out_box, out_mask  # BGR->RGB like reference
