"""Oriented-box detection loss (reference utils/loss.py:735-851 v8OBBLoss,
utils/tal.py:336 RotatedTaskAlignedAssigner, RotatedBboxLoss loss.py:236).

Static-shape rotated task-aligned assignment: candidate anchors are tested
inside rotated gt boxes by corner dot-products; the alignment/overlap metric
is probIoU. Box loss = 1 - probIoU; DFL on the axis-aligned distances.
Items: [box, cls, dfl] like the reference.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from bsyolo_tpu.losses.detect import (
    DetectionLossConfig,
    LossState,
    _bce_with_logits,
    _dfl_loss,
    _ema_slide_weight,
)
from bsyolo_tpu.nn.modules import dfl_decode
from bsyolo_tpu.ops.anchors import bbox2dist, dist2rbox, make_anchors
from bsyolo_tpu.ops.boxes import xywh2xyxy
from bsyolo_tpu.ops.obb import probiou, xywhr2xyxyxyxy

Array = jax.Array


def _candidates_in_rotated_gts(anc_points: Array, gt_rboxes: Array) -> Array:
    """(A, 2) anchors inside (B, M, 5) xywhr boxes -> (B, M, A) bool
    (reference RotatedTaskAlignedAssigner.select_candidates_in_gts)."""
    corners = xywhr2xyxyxyxy(gt_rboxes)  # (B, M, 4, 2)
    a = corners[..., 0, :][:, :, None, :]  # (B, M, 1, 2)
    b = corners[..., 1, :][:, :, None, :]
    d = corners[..., 3, :][:, :, None, :]
    ab = b - a
    ad = d - a
    ap = anc_points[None, None, :, :] - a  # (B, M, A, 2)
    norm_ab = jnp.sum(ab * ab, axis=-1)
    norm_ad = jnp.sum(ad * ad, axis=-1)
    ap_ab = jnp.sum(ap * ab, axis=-1)
    ap_ad = jnp.sum(ap * ad, axis=-1)
    return (ap_ab >= 0) & (ap_ab <= norm_ab) & (ap_ad >= 0) & (ap_ad <= norm_ad)


def rotated_task_aligned_assign(
    pd_scores: Array,  # (B, A, nc)
    pd_rboxes: Array,  # (B, A, 5) xywhr
    anc_points: Array,  # (A, 2)
    gt_labels: Array,  # (B, M)
    gt_rboxes: Array,  # (B, M, 5)
    mask_gt: Array,  # (B, M)
    topk: int = 10,
    num_classes: int = 80,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
):
    b, A, nc = pd_scores.shape
    M = gt_rboxes.shape[1]
    mask_gt = mask_gt.astype(jnp.bool_)
    mask_in = _candidates_in_rotated_gts(anc_points, gt_rboxes)
    mask_valid = mask_in & mask_gt[:, :, None]

    labels = jnp.clip(gt_labels.astype(jnp.int32), 0, nc - 1)
    bbox_scores = jnp.take_along_axis(
        pd_scores[:, None, :, :], labels[:, :, None, None], axis=-1
    )[..., 0]
    bbox_scores = jnp.where(mask_valid, bbox_scores, 0.0)
    overlaps = probiou(gt_rboxes[:, :, None, :], pd_rboxes[:, None, :, :])[..., 0]
    overlaps = jnp.where(mask_valid, jnp.clip(overlaps, 0.0), 0.0)
    align = bbox_scores**alpha * overlaps**beta

    k = min(topk, A)
    _, topk_idxs = jax.lax.top_k(align, k)
    ones = jnp.broadcast_to(mask_gt[:, :, None], topk_idxs.shape).astype(jnp.int8)
    count = jnp.zeros((b, M, A), jnp.int8)
    bidx = jnp.arange(b)[:, None, None]
    midx = jnp.arange(M)[None, :, None]
    count = count.at[bidx, midx, topk_idxs].add(ones)
    mask_pos = (count == 1) & mask_valid

    fg_counts = jnp.sum(mask_pos.astype(jnp.int32), axis=1)
    multi = fg_counts[:, None, :] > 1
    max_idx = jnp.argmax(overlaps, axis=1)
    is_max = jax.nn.one_hot(max_idx, M, axis=1, dtype=jnp.bool_)
    mask_pos = jnp.where(multi, is_max, mask_pos)
    fg_mask = jnp.sum(mask_pos.astype(jnp.int32), axis=1) > 0
    target_gt_idx = jnp.argmax(mask_pos, axis=1).astype(jnp.int32)

    target_labels = jnp.take_along_axis(labels, target_gt_idx, axis=1)
    target_rboxes = jnp.take_along_axis(gt_rboxes, target_gt_idx[..., None], axis=1)
    target_scores = jax.nn.one_hot(target_labels, nc, dtype=pd_scores.dtype) * fg_mask[..., None]

    align = align * mask_pos
    pos_align = jnp.max(align, axis=-1, keepdims=True)
    pos_over = jnp.max(overlaps * mask_pos, axis=-1, keepdims=True)
    norm = jnp.max(align * pos_over / (pos_align + eps), axis=-2)
    target_scores = target_scores * norm[..., None]
    return target_rboxes, target_scores, fg_mask, target_gt_idx


@partial(jax.jit, static_argnames=("cfg", "ne"))
def obb_loss(
    feats,  # per-level maps (B, H, W, 4*reg_max + nc + ne)
    gt_cls: Array,  # (B, M)
    gt_rboxes: Array,  # (B, M, 5) xywhr, xy/wh normalized, r radians
    gt_mask: Array,  # (B, M)
    state: LossState,
    cfg: DetectionLossConfig,
    ne: int = 1,
) -> Tuple[Array, Array, LossState]:
    reg_max, nc = cfg.reg_max, cfg.nc
    no = nc + reg_max * 4 + ne
    b = feats[0].shape[0]
    feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
    imgsz_h = feat_shapes[0][0] * cfg.strides[0]
    imgsz_w = feat_shapes[0][1] * cfg.strides[0]

    flat = jnp.concatenate([f.reshape(b, -1, no) for f in feats], axis=1)
    pred_distri = flat[..., : reg_max * 4].astype(jnp.float32)
    pred_scores = flat[..., reg_max * 4 : reg_max * 4 + nc].astype(jnp.float32)
    angle_raw = flat[..., reg_max * 4 + nc :].astype(jnp.float32)
    pred_angle = (jax.nn.sigmoid(angle_raw) - 0.25) * math.pi  # (B, A, 1)

    anchor_points, stride_tensor = make_anchors(feat_shapes, cfg.strides, 0.5)
    scale = jnp.asarray([imgsz_w, imgsz_h, imgsz_w, imgsz_h], jnp.float32)
    gt_px = gt_rboxes.astype(jnp.float32)
    gt_px = jnp.concatenate([gt_px[..., :4] * scale, gt_px[..., 4:5]], axis=-1)
    # reference loss.py:784-785: "filter rboxes of tiny size to stabilize
    # training" — degenerate warped rboxes (mosaic corner-clipping can
    # collapse one side) otherwise become near-zero-covariance probIoU
    # targets with exploding gradients
    mask_gt = (
        gt_mask.astype(jnp.bool_)
        & (gt_px[..., 2] >= 2.0)
        & (gt_px[..., 3] >= 2.0)
    )

    dist = dfl_decode(pred_distri, reg_max)
    pred_rboxes = dist2rbox(dist, pred_angle, anchor_points[None])  # feature units, (B, A, 4)
    pred_rboxes_full = jnp.concatenate([pred_rboxes, pred_angle], axis=-1)  # xywhr

    pd_px = jnp.concatenate(
        [pred_rboxes * stride_tensor[None], pred_angle], axis=-1
    )
    target_rboxes, target_scores, fg_mask, _ = rotated_task_aligned_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pd_px),
        anchor_points * stride_tensor,
        gt_cls,
        gt_px,
        mask_gt,
        topk=cfg.tal_topk,
        num_classes=nc,
    )
    target_scores_sum = jnp.maximum(jnp.sum(target_scores), 1.0)

    new_updates = state.updates + 1
    d = cfg.ema_decay * (1.0 - jnp.exp(-new_updates.astype(jnp.float32) / cfg.ema_tau))
    new_iou_mean = d * state.iou_mean + (1.0 - d) * 0.2
    bce = _bce_with_logits(pred_scores, target_scores)
    loss_cls = jnp.sum(bce * _ema_slide_weight(target_scores, new_iou_mean)) / target_scores_sum

    # rotated box loss: 1 - probIoU (reference RotatedBboxLoss, loss.py:236)
    tb_feat = jnp.concatenate(
        [target_rboxes[..., :4] / stride_tensor[None], target_rboxes[..., 4:5]], axis=-1
    )
    w = jnp.sum(target_scores, axis=-1) * fg_mask
    iou = probiou(pred_rboxes_full, tb_feat)[..., 0]
    loss_iou = jnp.sum((1.0 - iou) * w) / target_scores_sum

    # DFL on the axis-aligned box of the rotated target (reference loss.py:245)
    tb_xyxy = xywh2xyxy(tb_feat[..., :4])
    target_ltrb = bbox2dist(anchor_points[None], tb_xyxy, reg_max - 1)
    dfl = _dfl_loss(pred_distri.reshape(b, -1, 4, reg_max), target_ltrb, reg_max)[..., 0]
    loss_dfl = jnp.sum(dfl * w) / target_scores_sum

    any_fg = jnp.any(fg_mask)
    loss_iou = jnp.where(any_fg, loss_iou, jnp.sum(pred_angle) * 0.0)
    loss_dfl = jnp.where(any_fg, loss_dfl, 0.0)

    items = jnp.stack([loss_iou * cfg.box, loss_cls * cfg.cls, loss_dfl * cfg.dfl])
    total = jnp.sum(items) * b
    return total, items, LossState(updates=new_updates, iou_mean=new_iou_mean)
