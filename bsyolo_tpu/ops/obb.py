"""Oriented-box geometry: probIoU, rotated NMS, corner conversion.

Reference: ultralytics/utils/metrics.py:240-340 (_get_covariance_matrix,
probiou, batch_probiou) and utils/ops.py:146 (nms_rotated).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def _get_covariance_matrix(obb: Array):
    """Gaussian covariance terms of xywhr boxes (reference metrics.py:240)."""
    w = obb[..., 2:3]
    h = obb[..., 3:4]
    r = obb[..., 4:5]
    a = (w**2) / 12.0
    b = (h**2) / 12.0
    cos = jnp.cos(r)
    sin = jnp.sin(r)
    cos2 = cos**2
    sin2 = sin**2
    return a * cos2 + b * sin2, a * sin2 + b * cos2, (a - b) * cos * sin


def probiou(obb1: Array, obb2: Array, CIoU: bool = False, eps: float = 1e-7) -> Array:
    """Probabilistic IoU of broadcastable xywhr boxes (reference metrics.py:281)."""
    x1, y1 = obb1[..., 0:1], obb1[..., 1:2]
    x2, y2 = obb2[..., 0:1], obb2[..., 1:2]
    a1, b1, c1 = _get_covariance_matrix(obb1)
    a2, b2, c2 = _get_covariance_matrix(obb2)

    denom = (a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps
    t1 = ((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2) / denom * 0.25
    t2 = ((c1 + c2) * (x2 - x1) * (y1 - y2)) / denom * 0.5
    # sqrt(u*v) floored at eps^2: zero-area boxes (the all-zero padded gt
    # rows every background anchor points at when a mosaic sample ends up
    # with no instances) make u*v exactly 0, where d sqrt(u*v)/du = v/(2*
    # sqrt(u*v)) is 0/0 -> NaN; one NaN Jacobian poisons the grads of EVERY
    # loss term through the shared trunk (0-cotangent * NaN = NaN). The
    # floor leaves non-degenerate values bit-identical (u*v >> eps^2) and
    # gives degenerate rows a finite (zero) gradient; their loss rows are
    # masked anyway.
    u = jnp.clip(a1 * b1 - c1**2, 0)
    v = jnp.clip(a2 * b2 - c2**2, 0)
    t3 = (
        jnp.log(
            ((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2)
            / (4 * jnp.sqrt(jnp.maximum(u * v, eps * eps)) + eps)
            + eps
        )
        * 0.5
    )
    bd = jnp.clip(t1 + t2 + t3, eps, 100.0)
    hd = jnp.sqrt(1.0 - jnp.exp(-bd) + eps)
    iou = 1.0 - hd
    if CIoU:
        w1, h1 = obb1[..., 2:3], obb1[..., 3:4]
        w2, h2 = obb2[..., 2:3], obb2[..., 3:4]
        v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
        return iou - v * alpha
    return iou


def batch_probiou(obb1: Array, obb2: Array) -> Array:
    """(N, 5) x (M, 5) -> (N, M) pairwise probIoU."""
    return probiou(obb1[:, None, :], obb2[None, :, :])[..., 0]


@partial(jax.jit, static_argnames=("conf_thres", "iou_thres", "max_det", "pre_k", "nc"))
def nms_rotated(
    prediction: Array,  # (B, A, 4+nc+1): xywh, scores, angle
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    pre_k: int = 512,
    nc: int = 0,
) -> Array:
    """Rotated NMS via probIoU (reference ops.py:146 + 230-270 rotated path).

    Returns (B, max_det, 7): x, y, w, h, conf, cls, angle (zero-padded).
    """
    from bsyolo_tpu.ops.nms import _greedy_keep

    if nc <= 0:
        nc = prediction.shape[-1] - 5

    def single(pred):
        boxes = pred[:, :4]
        scores = pred[:, 4 : 4 + nc]
        angle = pred[:, 4 + nc]
        best = jnp.max(scores, axis=-1)
        cls = jnp.argmax(scores, axis=-1)
        k = min(pre_k, pred.shape[0])
        cand_scores, idx = jax.lax.top_k(best, k)
        valid = cand_scores > conf_thres
        cand = jnp.concatenate([boxes[idx], angle[idx, None]], axis=-1)  # (k, 5)
        iou = batch_probiou(cand, cand)
        same_cls = cls[idx][:, None] == cls[idx][None, :]
        keep = _greedy_keep(jnp.where(same_cls, iou, 0.0), valid, iou_thres)
        ks = jnp.where(keep, cand_scores, -1.0)
        top, oidx = jax.lax.top_k(ks, min(max_det, k))
        ok = top > 0
        out = jnp.concatenate(
            [
                cand[oidx][:, :4] * ok[:, None],
                jnp.where(ok, top, 0.0)[:, None],
                jnp.where(ok, cls[idx][oidx].astype(jnp.float32), -1.0)[:, None],
                cand[oidx][:, 4:5] * ok[:, None],
            ],
            axis=-1,
        )
        return out

    return jax.vmap(single)(prediction.astype(jnp.float32))


def xywhr2xyxyxyxy(obb: Array) -> Array:
    """xywhr -> 4 corner points (..., 4, 2) (reference ops.py xywhr2xyxyxyxy)."""
    c = obb[..., 0:2]
    w = obb[..., 2:3]
    h = obb[..., 3:4]
    r = obb[..., 4:5]
    cos, sin = jnp.cos(r), jnp.sin(r)
    dx1 = jnp.concatenate([w / 2 * cos, w / 2 * sin], -1)
    dy1 = jnp.concatenate([-h / 2 * sin, h / 2 * cos], -1)
    return jnp.stack([c + dx1 + dy1, c + dx1 - dy1, c - dx1 - dy1, c - dx1 + dy1], axis=-2)
