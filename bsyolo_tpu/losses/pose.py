"""Pose estimation loss (reference utils/loss.py:569-724 v8PoseLoss).

Detection terms + OKS keypoint-location loss + keypoint-visibility BCE,
reformulated dense/masked over all anchors (the reference boolean-indexes the
foreground set). Item order matches the reference:
[box, pose, kobj, cls, dfl].
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

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

Array = jax.Array

# COCO keypoint OKS sigmas (reference utils/metrics.py OKS_SIGMA)
OKS_SIGMA = (
    np.array(
        [0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62, 1.07, 1.07, 0.87, 0.87, 0.89, 0.89]
    )
    / 10.0
)


@partial(jax.jit, static_argnames=("cfg", "kpt_shape", "pose_gain", "kobj_gain"))
def pose_loss(
    feats,  # per-level maps (B, H, W, 4*reg_max + nc + nk)
    gt_cls: Array,  # (B, M)
    gt_bboxes: Array,  # (B, M, 4) normalized xywh
    gt_mask: Array,  # (B, M)
    gt_kpts: Array,  # (B, M, nkpt, 2|3) normalized coords (+ visibility)
    state: LossState,
    cfg: DetectionLossConfig,
    kpt_shape: Tuple[int, int] = (17, 3),
    pose_gain: float = 12.0,
    kobj_gain: float = 1.0,
) -> Tuple[Array, Array, LossState]:
    reg_max, nc = cfg.reg_max, cfg.nc
    nkpt, nd = kpt_shape
    nk = nkpt * nd
    no = nc + reg_max * 4 + nk
    b = feats[0].shape[0]
    feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
    imgsz_h = feat_shapes[0][0] * cfg.strides[0]
    imgsz_w = feat_shapes[0][1] * cfg.strides[0]

    flat = jnp.concatenate([f.reshape(b, -1, no) for f in feats], axis=1)
    pred_distri = flat[..., : reg_max * 4].astype(jnp.float32)
    pred_scores = flat[..., reg_max * 4 : reg_max * 4 + nc].astype(jnp.float32)
    pred_kraw = flat[..., reg_max * 4 + nc :].astype(jnp.float32)  # (B, A, nk)

    anchor_points, stride_tensor = make_anchors(feat_shapes, cfg.strides, 0.5)
    A = anchor_points.shape[0]
    scale = jnp.asarray([imgsz_w, imgsz_h, imgsz_w, imgsz_h], jnp.float32)
    gt_xyxy = xywh2xyxy(gt_bboxes.astype(jnp.float32) * scale)
    mask_gt = gt_mask.astype(jnp.bool_) & (jnp.sum(gt_xyxy, axis=-1) > 0)

    pred_dist_exp = dfl_decode(pred_distri, reg_max)
    pred_bboxes = dist2bbox(pred_dist_exp, anchor_points[None], xywh=False)
    # kpts decoded in feature units (reference kpts_decode, loss.py:652)
    pk = pred_kraw.reshape(b, A, nkpt, nd)
    pk_xy = pk[..., :2] * 2.0 + (anchor_points[None, :, None, :] - 0.5)
    pred_kpts = jnp.concatenate([pk_xy, pk[..., 2:]], axis=-1) if nd == 3 else pk_xy

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

    # cls (EMA-Slide BCE)
    new_updates = state.updates + 1
    d = cfg.ema_decay * (1.0 - jnp.exp(-new_updates.astype(jnp.float32) / cfg.ema_tau))
    new_iou_mean = d * state.iou_mean + (1.0 - d) * 0.2
    bce = _bce_with_logits(pred_scores, target_scores)
    loss_cls = jnp.sum(bce * _ema_slide_weight(target_scores, new_iou_mean)) / target_scores_sum

    # box + dfl
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

    # --- keypoints (reference calculate_keypoints_loss, loss.py:660-724) ---
    kpts_px = gt_kpts.astype(jnp.float32)
    kpts_px = kpts_px.at[..., 0].multiply(imgsz_w).at[..., 1].multiply(imgsz_h)
    sel = jnp.take_along_axis(
        kpts_px, assign.target_gt_idx[:, :, None, None], axis=1
    )  # (B, A, nkpt, nd)
    sel = sel.at[..., :2].divide(stride_tensor[None, :, None, :])  # (1, A, 1, 1)

    kpt_vis = sel[..., 2] != 0 if nd == 3 else jnp.ones(sel.shape[:-1], bool)  # (B, A, nkpt)
    fgk = fg_mask[..., None]  # (B, A, 1)
    sig = jnp.asarray(OKS_SIGMA if nkpt == 17 and nd == 3 else np.ones(nkpt) / nkpt, jnp.float32)
    area = jnp.clip(
        (tb_feat[..., 2] - tb_feat[..., 0]) * (tb_feat[..., 3] - tb_feat[..., 1]), 1e-9
    )[..., None]  # (B, A, 1)
    dsq = jnp.sum((pred_kpts[..., :2] - sel[..., :2]) ** 2, axis=-1)  # (B, A, nkpt)
    e = dsq / ((2 * sig[None, None, :]) ** 2 * (area + 1e-9) * 2)
    n_vis = jnp.sum(kpt_vis & fgk, axis=-1, keepdims=True)  # (B, A, 1)
    factor = nkpt / (n_vis + 1e-9)
    per_kpt = factor * (1 - jnp.exp(-e)) * kpt_vis * fgk
    n_fg = jnp.maximum(jnp.sum(fg_mask), 1.0)
    loss_pose = jnp.sum(per_kpt) / (n_fg * nkpt)

    if nd == 3:
        obj_bce = _bce_with_logits(pred_kpts[..., 2], kpt_vis.astype(jnp.float32))
        loss_kobj = jnp.sum(obj_bce * fgk) / (n_fg * nkpt)
    else:
        loss_kobj = jnp.float32(0)

    any_fg = jnp.any(fg_mask)
    loss_iou = jnp.where(any_fg, loss_iou, 0.0)
    loss_dfl = jnp.where(any_fg, loss_dfl, 0.0)
    loss_pose = jnp.where(any_fg, loss_pose, jnp.sum(pred_kraw) * 0.0)
    loss_kobj = jnp.where(any_fg, loss_kobj, 0.0)

    items = jnp.stack(
        [
            loss_iou * cfg.box,
            loss_pose * pose_gain,
            loss_kobj * kobj_gain,
            loss_cls * cfg.cls,
            loss_dfl * cfg.dfl,
        ]
    )
    total = jnp.sum(items) * b
    return total, items, LossState(updates=new_updates, iou_mean=new_iou_mean)
