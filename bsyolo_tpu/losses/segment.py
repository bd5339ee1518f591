"""Instance segmentation loss (reference utils/loss.py:386-568 v8SegmentationLoss).

Detection loss (TAL + EMA-Slide BCE + CIoU/NWD + DFL) plus a prototype-mask
BCE term. Static-shape redesign: the reference computes mask BCE for the
ragged set of foreground anchors; here the top ``max_masks`` anchors by
assigned score are selected per image (fixed K), which covers the reference
semantics for any scene with <= K foreground anchors.

Ground-truth masks arrive overlap-encoded like the reference's
``overlap_mask=True`` path (loss.py:455-470): one (H/4, W/4) int map per
image where pixel value g+1 marks instance g.
"""

from __future__ import annotations

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
from bsyolo_tpu.losses.tal import task_aligned_assign
from bsyolo_tpu.nn.modules import dfl_decode
from bsyolo_tpu.ops.anchors import bbox2dist, dist2bbox, make_anchors
from bsyolo_tpu.ops.boxes import bbox_iou, wasserstein_loss, xywh2xyxy
from bsyolo_tpu.ops.masks import crop_mask

Array = jax.Array


@partial(jax.jit, static_argnames=("cfg", "nm", "max_masks", "overlap"))
def segmentation_loss(
    outputs,  # {"feats": [...], "proto": (B, Hm, Wm, nm)}
    gt_cls: Array,  # (B, M)
    gt_bboxes: Array,  # (B, M, 4) normalized xywh
    gt_mask: Array,  # (B, M) validity
    gt_masks: Array,  # (B, Hm, Wm) int overlap-encoded instance masks
    state: LossState,
    cfg: DetectionLossConfig,
    nm: int = 32,
    max_masks: int = 100,
    overlap: bool = True,
) -> Tuple[Array, Array, LossState]:
    """Returns (total, items[box, seg, cls, dfl], new_state) — reference order."""
    feats = outputs["feats"]
    proto = outputs["proto"].astype(jnp.float32)  # (B, Hm, Wm, nm)
    reg_max, nc = cfg.reg_max, cfg.nc
    no = nc + reg_max * 4 + nm
    b = feats[0].shape[0]
    feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
    imgsz_h = feat_shapes[0][0] * cfg.strides[0]
    imgsz_w = feat_shapes[0][1] * cfg.strides[0]

    flat = jnp.concatenate([f.reshape(b, -1, no) for f in feats], axis=1)
    pred_distri = flat[..., : reg_max * 4].astype(jnp.float32)
    pred_scores = flat[..., reg_max * 4 : reg_max * 4 + nc].astype(jnp.float32)
    pred_coeffs = flat[..., reg_max * 4 + nc :].astype(jnp.float32)  # (B, A, nm)

    anchor_points, stride_tensor = make_anchors(feat_shapes, cfg.strides, 0.5)
    scale = jnp.asarray([imgsz_w, imgsz_h, imgsz_w, imgsz_h], jnp.float32)
    gt_xyxy = xywh2xyxy(gt_bboxes.astype(jnp.float32) * scale)
    mask_gt = gt_mask.astype(jnp.bool_) & (jnp.sum(gt_xyxy, axis=-1) > 0)

    pred_dist_exp = dfl_decode(pred_distri, reg_max)
    pred_bboxes = dist2bbox(pred_dist_exp, anchor_points[None], xywh=False)

    assign = task_aligned_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_bboxes * stride_tensor[None]),
        anchor_points * stride_tensor,
        gt_cls,
        gt_xyxy,
        mask_gt,
        topk=cfg.tal_topk,
        num_classes=nc,
    )
    target_scores, fg_mask = assign.target_scores, assign.fg_mask
    target_scores_sum = jnp.maximum(jnp.sum(target_scores), 1.0)

    # cls (EMA-Slide BCE, identical to detect)
    new_updates = state.updates + 1
    d = cfg.ema_decay * (1.0 - jnp.exp(-new_updates.astype(jnp.float32) / cfg.ema_tau))
    new_iou_mean = d * state.iou_mean + (1.0 - d) * 0.2
    bce = _bce_with_logits(pred_scores, target_scores)
    loss_cls = jnp.sum(bce * _ema_slide_weight(target_scores, new_iou_mean)) / target_scores_sum

    # box + dfl (identical to detect)
    tb_feat = assign.target_bboxes / stride_tensor[None]
    w = jnp.sum(target_scores, axis=-1) * fg_mask
    iou = bbox_iou(pred_bboxes, tb_feat, xywh=False, CIoU=True)[..., 0]
    loss_iou = jnp.sum((1.0 - iou) * w) / target_scores_sum
    if cfg.nwd_loss:
        nwd = wasserstein_loss(pred_bboxes, tb_feat)[..., 0]
        loss_iou = cfg.iou_ratio * loss_iou + (1 - cfg.iou_ratio) * (
            jnp.sum((1.0 - nwd) * w) / target_scores_sum
        )
    target_ltrb = bbox2dist(anchor_points[None], tb_feat, reg_max - 1)
    dfl = _dfl_loss(pred_distri.reshape(b, -1, 4, reg_max), target_ltrb, reg_max)[..., 0]
    loss_dfl = jnp.sum(dfl * w) / target_scores_sum

    # --- mask loss (reference calculate_segmentation_loss, loss.py:470-560) ---
    hm, wm = proto.shape[1], proto.shape[2]
    K = max_masks
    sel_w, sel_idx = jax.lax.top_k(w, K)  # (B, K): fg anchors by assigned score
    sel_valid = (sel_w > 0) & jnp.take_along_axis(fg_mask, sel_idx, axis=1)
    sel_coeffs = jnp.take_along_axis(pred_coeffs, sel_idx[..., None], axis=1)  # (B, K, nm)
    sel_gt = jnp.take_along_axis(assign.target_gt_idx, sel_idx, axis=1)  # (B, K)
    sel_boxes = jnp.take_along_axis(assign.target_bboxes, sel_idx[..., None], axis=1)  # px

    pred_masks = jnp.einsum("bhwc,bkc->bkhw", proto, sel_coeffs)  # logits (B, K, Hm, Wm)
    if overlap:
        gt_inst = gt_masks[:, None, :, :] == (sel_gt[:, :, None, None] + 1)
    else:
        gt_inst = jnp.take_along_axis(
            gt_masks, sel_gt[:, :, None, None], axis=1
        )  # expects (B, M, Hm, Wm)
    gt_inst = gt_inst.astype(jnp.float32)

    ce = _bce_with_logits(pred_masks, gt_inst)  # (B, K, Hm, Wm)
    mask_scale = jnp.asarray([wm / imgsz_w, hm / imgsz_h, wm / imgsz_w, hm / imgsz_h], jnp.float32)
    mxyxy = sel_boxes * mask_scale
    ce_flat = ce.reshape(b * K, hm, wm)
    cropped = crop_mask(ce_flat, mxyxy.reshape(b * K, 4)).reshape(b, K, hm, wm)
    area = jnp.maximum(
        (sel_boxes[..., 2] - sel_boxes[..., 0]) * (sel_boxes[..., 3] - sel_boxes[..., 1]), 1.0
    ) / (imgsz_w * imgsz_h) * (hm * wm)
    per_anchor = jnp.mean(cropped, axis=(2, 3)) * (hm * wm) / jnp.maximum(area, 1.0)
    n_fg = jnp.maximum(jnp.sum(fg_mask), 1.0)
    loss_seg = jnp.sum(per_anchor * sel_valid) / n_fg

    any_fg = jnp.any(fg_mask)
    loss_iou = jnp.where(any_fg, loss_iou, 0.0)
    loss_dfl = jnp.where(any_fg, loss_dfl, 0.0)
    loss_seg = jnp.where(any_fg, loss_seg, jnp.sum(pred_coeffs) * 0.0)

    items = jnp.stack(
        [loss_iou * cfg.box, loss_seg * cfg.box, loss_cls * cfg.cls, loss_dfl * cfg.dfl]
    )
    total = jnp.sum(items) * b
    return total, items, LossState(updates=new_updates, iou_mean=new_iou_mean)
