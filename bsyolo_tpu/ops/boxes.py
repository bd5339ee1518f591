"""Box geometry and IoU family.

Functional JAX equivalents of the reference box math:
- coordinate conversions (reference: ultralytics/utils/ops.py:416-470)
- the fork-extended ``bbox_iou`` supporting GIoU/DIoU/CIoU/SIoU/MDPIoU and the
  Inner-IoU refinement (reference: ultralytics/utils/metrics.py:87-164,
  inner_iou at metrics.py:73)
- NWD / Wasserstein similarity used by the fork's box loss
  (reference: ultralytics/utils/loss.py:103-140, tal.py:14)

All functions are shape-polymorphic over leading dims and operate on the last
axis of size 4. Everything is jit-safe (no data-dependent shapes).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def xywh2xyxy(x: Array) -> Array:
    """(cx, cy, w, h) -> (x1, y1, x2, y2)."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    hw, hh = w * 0.5, h * 0.5
    return jnp.concatenate([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


def xyxy2xywh(x: Array) -> Array:
    """(x1, y1, x2, y2) -> (cx, cy, w, h)."""
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1)


def xywhn2xyxy(x: Array, w: float, h: float, padw: float = 0.0, padh: float = 0.0) -> Array:
    """Normalized (cx, cy, w, h) -> pixel (x1, y1, x2, y2) (reference ops.py:470)."""
    cx, cy, bw, bh = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [
            w * (cx - bw / 2) + padw,
            h * (cy - bh / 2) + padh,
            w * (cx + bw / 2) + padw,
            h * (cy + bh / 2) + padh,
        ],
        axis=-1,
    )


def xyxy2xywhn(x: Array, w: float, h: float, eps: float = 0.0) -> Array:
    """Pixel (x1, y1, x2, y2) -> normalized (cx, cy, w, h)."""
    out = xyxy2xywh(x)
    scale = jnp.asarray([w, h, w, h], dtype=out.dtype)
    return out / (scale + eps)


def clip_boxes(boxes: Array, shape: Tuple[int, int]) -> Array:
    """Clip xyxy boxes to image bounds ``shape=(h, w)`` (reference ops.py:319)."""
    h, w = shape
    lo = jnp.zeros((4,), dtype=boxes.dtype)
    hi = jnp.asarray([w, h, w, h], dtype=boxes.dtype)
    return jnp.clip(boxes, lo, hi)


def scale_boxes(
    img1_shape: Tuple[int, int],
    boxes: Array,
    img0_shape: Tuple[int, int],
    ratio_pad=None,
    padding: bool = True,
) -> Array:
    """Rescale xyxy boxes from letterboxed ``img1_shape`` back to ``img0_shape``.

    Mirrors reference ops.py:92-130 (gain/pad inversion with 0.1 round-offset).
    """
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad_w = round((img1_shape[1] - img0_shape[1] * gain) / 2 - 0.1)
        pad_h = round((img1_shape[0] - img0_shape[0] * gain) / 2 - 0.1)
    else:
        gain = ratio_pad[0][0]
        pad_w, pad_h = ratio_pad[1]
    if padding:
        boxes = boxes - jnp.asarray([pad_w, pad_h, pad_w, pad_h], dtype=boxes.dtype)
    boxes = boxes / gain
    return clip_boxes(boxes, img0_shape)


def _split_xyxy(box: Array):
    return box[..., 0:1], box[..., 1:2], box[..., 2:3], box[..., 3:4]


def inner_iou(box1: Array, box2: Array, xywh: bool = True, eps: float = 1e-7, ratio: float = 0.7) -> Array:
    """Inner-IoU: IoU of ``ratio``-shrunk boxes (reference metrics.py:73-85)."""
    if not xywh:
        box1, box2 = xyxy2xywh(box1), xyxy2xywh(box2)
    x1, y1, w1, h1 = _split_xyxy(box1)
    x2, y2, w2, h2 = _split_xyxy(box2)
    b1x1, b1x2 = x1 - w1 * ratio / 2, x1 + w1 * ratio / 2
    b1y1, b1y2 = y1 - h1 * ratio / 2, y1 + h1 * ratio / 2
    b2x1, b2x2 = x2 - w2 * ratio / 2, x2 + w2 * ratio / 2
    b2y1, b2y2 = y2 - h2 * ratio / 2, y2 + h2 * ratio / 2
    inter = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0) * jnp.clip(
        jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0
    )
    union = w1 * h1 * ratio * ratio + w2 * h2 * ratio * ratio - inter + eps
    return inter / union


def bbox_iou(
    box1: Array,
    box2: Array,
    xywh: bool = True,
    GIoU: bool = False,
    DIoU: bool = False,
    CIoU: bool = False,
    SIoU: bool = False,
    MDPIoU: bool = False,
    Inner_iou: bool = False,
    feat_h: float = 640.0,
    feat_w: float = 640.0,
    eps: float = 1e-7,
    ratio: float = 0.7,
) -> Array:
    """Elementwise IoU family over broadcastable box tensors (last dim 4).

    Faithful port of the fork-extended reference (metrics.py:87-164) including
    its quirks: in xyxy mode only the heights get the +eps stabilizer, and the
    CIoU aspect term ``alpha`` is treated as a constant (no gradient), matching
    the reference's ``torch.no_grad()`` block.
    """
    if xywh:
        x1, y1, w1, h1 = _split_xyxy(box1)
        x2, y2, w2, h2 = _split_xyxy(box2)
        b1x1, b1x2, b1y1, b1y2 = x1 - w1 / 2, x1 + w1 / 2, y1 - h1 / 2, y1 + h1 / 2
        b2x1, b2x2, b2y1, b2y2 = x2 - w2 / 2, x2 + w2 / 2, y2 - h2 / 2, y2 + h2 / 2
    else:
        b1x1, b1y1, b1x2, b1y2 = _split_xyxy(box1)
        b2x1, b2y1, b2x2, b2y2 = _split_xyxy(box2)
        w1, h1 = b1x2 - b1x1, b1y2 - b1y1 + eps
        w2, h2 = b2x2 - b2x1, b2y2 - b2y1 + eps

    inter = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0) * jnp.clip(
        jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    if CIoU or DIoU or GIoU or SIoU:
        cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
        ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
        if CIoU or DIoU or SIoU:
            c2 = cw**2 + ch**2 + eps
            rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
            if CIoU:
                v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
                alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
                if Inner_iou:
                    iou = inner_iou(box1, box2, xywh=xywh, ratio=ratio)
                return iou - (rho2 / c2 + v * alpha)
            if SIoU:
                s_cw = (b2x1 + b2x2 - b1x1 - b1x2) * 0.5 + eps
                s_ch = (b2y1 + b2y2 - b1y1 - b1y2) * 0.5 + eps
                sigma = jnp.sqrt(s_cw**2 + s_ch**2)
                sin_a1 = jnp.abs(s_cw) / sigma
                sin_a2 = jnp.abs(s_ch) / sigma
                threshold = 2**0.5 / 2
                sin_a = jnp.where(sin_a1 > threshold, sin_a2, sin_a1)
                angle_cost = jnp.cos(jnp.arcsin(sin_a) * 2 - math.pi / 2)
                rho_x = (s_cw / cw) ** 2
                rho_y = (s_ch / ch) ** 2
                gamma = angle_cost - 2
                distance_cost = 2 - jnp.exp(gamma * rho_x) - jnp.exp(gamma * rho_y)
                omiga_w = jnp.abs(w1 - w2) / jnp.maximum(w1, w2)
                omiga_h = jnp.abs(h1 - h2) / jnp.maximum(h1, h2)
                shape_cost = (1 - jnp.exp(-omiga_w)) ** 4 + (1 - jnp.exp(-omiga_h)) ** 4
                if Inner_iou:
                    iou = inner_iou(box1, box2, xywh=xywh, ratio=ratio)
                return iou - 0.5 * (distance_cost + shape_cost) + eps
            if Inner_iou:
                iou = inner_iou(box1, box2, xywh=xywh, ratio=ratio)
            return iou - rho2 / c2  # DIoU
        c_area = cw * ch + eps
        if Inner_iou:
            iou = inner_iou(box1, box2, xywh=xywh, ratio=ratio)
        return iou - (c_area - union) / c_area  # GIoU
    if MDPIoU:
        d1 = (b2x1 - b1x1) ** 2 + (b2y1 - b1y1) ** 2
        d2 = (b2x2 - b1x2) ** 2 + (b2y2 - b1y2) ** 2
        hw2 = feat_h**2 + feat_w**2
        if Inner_iou:
            iou = inner_iou(box1, box2, xywh=xywh, ratio=ratio)
        return iou - d1 / hw2 - d2 / hw2
    if Inner_iou:
        iou = inner_iou(box1, box2, xywh=xywh, ratio=ratio)
    return iou


def wasserstein_loss(pred: Array, target: Array, eps: float = 1e-7, constant: float = 12.8) -> Array:
    """Normalized Wasserstein (NWD) similarity of xyxy boxes (reference loss.py:103-140)."""
    b1x1, b1y1, b1x2, b1y2 = _split_xyxy(pred)
    b2x1, b2y1, b2x2, b2y2 = _split_xyxy(target)
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1 + eps
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1 + eps
    cx1, cy1 = (b1x1 + b1x2) / 2, (b1y1 + b1y2) / 2
    cx2, cy2 = (b2x1 + b2x2) / 2, (b2y1 + b2y2) / 2
    center_distance = (cx1 - cx2) ** 2 + (cy1 - cy2) ** 2 + eps
    wh_distance = ((w1 - w2) ** 2 + (h1 - h2) ** 2) / 4
    wasserstein_2 = center_distance + wh_distance
    return jnp.exp(-jnp.sqrt(wasserstein_2) / constant)


def box_iou_pairwise(box1: Array, box2: Array, eps: float = 1e-7) -> Array:
    """Pairwise plain IoU: (N,4) x (M,4) -> (N,M) xyxy (reference metrics.py:44-71)."""
    a1 = box1[:, None, :2]
    a2 = box1[:, None, 2:]
    b1 = box2[None, :, :2]
    b2 = box2[None, :, 2:]
    inter = jnp.prod(jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0), axis=2)
    area1 = jnp.prod(a2 - a1, axis=2)
    area2 = jnp.prod(b2 - b1, axis=2)
    return inter / (area1 + area2 - inter + eps)
