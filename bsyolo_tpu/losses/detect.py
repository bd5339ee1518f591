"""Detection loss: EMA-Slide BCE + CIoU/NWD box loss + DFL.

Reference: ultralytics/utils/loss.py — v8DetectionLoss (loss.py:264-385),
EMASlideLoss (loss.py:64-101), BboxLoss with the fork's NWD blend
(loss.py:195-233), DFLoss (loss.py:166).

TPU-first redesign: everything is a pure function over static shapes.
The EMASlideLoss python-side mutable state (updates counter + decayed
iou_mean, reference loss.py:70-90) becomes an explicit LossState carried
through the jitted train step. Targets arrive pre-padded to max_gt with a
validity mask instead of the reference's ragged preprocess (loss.py:291-307).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax.struct import dataclass as flax_dataclass

from bsyolo_tpu.losses.tal import task_aligned_assign
from bsyolo_tpu.ops.anchors import bbox2dist, dist2bbox, make_anchors
from bsyolo_tpu.ops.boxes import bbox_iou, wasserstein_loss, xywh2xyxy
from bsyolo_tpu.nn.modules import dfl_decode

Array = jax.Array


class DetectionLossConfig(NamedTuple):
    nc: int
    strides: Tuple[int, ...]
    reg_max: int = 16
    box: float = 7.5
    cls: float = 0.5
    dfl: float = 1.5
    nwd_loss: bool = True  # fork default cfg nwdloss: True (default.yaml:38)
    iou_ratio: float = 0.6  # fork default cfg iou_ratio: 0.6 (default.yaml:39)
    tal_topk: int = 10
    ema_decay: float = 0.4  # EMASlideLoss decay (loss.py:66)
    ema_tau: float = 2000.0
    assigner_bf16: bool = False  # run the (stop-gradient) TAL assignment in
    #   bfloat16: the assigner streams ~15 (B, max_gt, A) tensors through HBM
    #   (275 MB each at batch 128 / A=8400 / M=64 in f32) and carries no
    #   gradients, so halving the bytes halves its wall-clock. Selection
    #   indices/masks can flip only on near-ties (equally-good anchors);
    #   target VALUES are still gathered from the f32 inputs.


@flax_dataclass
class LossState:
    """EMASlideLoss carried state (reference keeps these on the loss object)."""

    updates: Array  # () int32
    iou_mean: Array  # () float32


def init_loss_state() -> LossState:
    return LossState(updates=jnp.int32(0), iou_mean=jnp.float32(1.0))


def _ema_slide_weight(true: Array, auto_iou: Array) -> Array:
    """Slide modulating weight (reference loss.py:90-99)."""
    auto_iou = jnp.maximum(auto_iou, 0.2)
    b1 = (true <= auto_iou - 0.1).astype(true.dtype)
    b2 = ((true > auto_iou - 0.1) & (true < auto_iou)).astype(true.dtype)
    b3 = (true >= auto_iou).astype(true.dtype)
    a2 = jnp.exp(1.0 - auto_iou)
    a3 = jnp.exp(-(true - 1.0))
    return b1 + a2 * b2 + a3 * b3


def _bce_with_logits(logits: Array, targets: Array) -> Array:
    """Elementwise BCEWithLogits (stable form)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _dfl_loss(pred_dist: Array, target: Array, reg_max: int) -> Array:
    """Distribution focal loss, mean over the 4 sides (reference loss.py:166-194).

    pred_dist: (..., 4, reg_max) logits; target: (..., 4) continuous dists.
    """
    target = jnp.clip(target, 0, reg_max - 1 - 0.01)
    tl = jnp.floor(target).astype(jnp.int32)
    tr = jnp.clip(tl + 1, 0, reg_max - 1)
    wl = (tl + 1).astype(target.dtype) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist.astype(jnp.float32), axis=-1)
    # Weighted soft one-hot target contracted against logp: a per-anchor
    # gather over the reg_max axis is a serialized dynamic load on TPU
    # (measured 78 ms/step at batch 64), while the equivalent one-hot
    # reduction lowers to a VPU-friendly masked sum (4.9 ms).
    iota = jnp.arange(reg_max, dtype=jnp.int32)
    soft = (tl[..., None] == iota).astype(logp.dtype) * wl[..., None]
    soft = soft + (tr[..., None] == iota).astype(logp.dtype) * wr[..., None]
    ce = -jnp.sum(logp * soft, axis=-1)
    return jnp.mean(ce, axis=-1, keepdims=True)


from functools import partial


@partial(jax.jit, static_argnames=("cfg",))
def detection_loss(
    feats: Sequence[Array],  # per-level raw maps (B, H, W, 4*reg_max + nc)
    gt_cls: Array,  # (B, M) int
    gt_bboxes: Array,  # (B, M, 4) xywh normalized to [0, 1]
    gt_mask: Array,  # (B, M) validity
    state: LossState,
    cfg: DetectionLossConfig,
) -> Tuple[Array, Array, LossState]:
    """Compute (total_loss, loss_items[box, cls, dfl], new_state).

    Matches reference v8DetectionLoss.__call__ (loss.py:318-385) including
    the `loss.sum() * batch_size` scaling.
    """
    reg_max, nc = cfg.reg_max, cfg.nc
    no = nc + reg_max * 4
    b = feats[0].shape[0]
    feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
    imgsz_h = feat_shapes[0][0] * cfg.strides[0]
    imgsz_w = feat_shapes[0][1] * cfg.strides[0]

    flat = jnp.concatenate([f.reshape(b, -1, no) for f in feats], axis=1)  # (B, A, no)
    pred_distri = flat[..., : reg_max * 4].astype(jnp.float32)
    pred_scores = flat[..., reg_max * 4 :].astype(jnp.float32)

    anchor_points, stride_tensor = make_anchors(feat_shapes, cfg.strides, 0.5)

    # targets: normalized xywh -> pixel xyxy (reference preprocess loss.py:291)
    scale = jnp.asarray([imgsz_w, imgsz_h, imgsz_w, imgsz_h], jnp.float32)
    gt_xyxy = xywh2xyxy(gt_bboxes.astype(jnp.float32) * scale)
    mask_gt = gt_mask.astype(jnp.bool_) & (jnp.sum(gt_xyxy, axis=-1) > 0)

    # decode pred boxes in feature units (loss.py:309-316)
    pred_dist_exp = dfl_decode(pred_distri, reg_max)  # (B, A, 4)
    pred_bboxes = dist2bbox(pred_dist_exp, anchor_points[None], xywh=False)  # feature units

    assign = task_aligned_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_bboxes * stride_tensor[None]),
        anchor_points * stride_tensor,
        gt_cls,
        gt_xyxy,
        mask_gt,
        topk=cfg.tal_topk,
        num_classes=nc,
        alpha=0.5,
        beta=6.0,
        bf16=cfg.assigner_bf16,
    )
    target_bboxes, target_scores, fg_mask = (
        assign.target_bboxes,
        assign.target_scores,
        assign.fg_mask,
    )
    target_scores_sum = jnp.maximum(jnp.sum(target_scores), 1.0)

    # --- cls: EMASlideLoss-wrapped BCE (loss.py:370; auto_iou is the default
    # 0.2 at the call site, decayed into iou_mean — loss.py:81-87) ---
    new_updates = state.updates + 1
    d = cfg.ema_decay * (1.0 - jnp.exp(-new_updates.astype(jnp.float32) / cfg.ema_tau))
    new_iou_mean = d * state.iou_mean + (1.0 - d) * 0.2
    bce = _bce_with_logits(pred_scores, target_scores)
    weight = _ema_slide_weight(target_scores, new_iou_mean)
    loss_cls = jnp.sum(bce * weight) / target_scores_sum

    # --- box: CIoU (+ NWD blend) over fg anchors (loss.py:205-233) ---
    target_bboxes_feat = target_bboxes / stride_tensor[None]
    w = jnp.sum(target_scores, axis=-1) * fg_mask  # (B, A)
    iou = bbox_iou(pred_bboxes, target_bboxes_feat, xywh=False, CIoU=True)[..., 0]
    loss_iou = jnp.sum((1.0 - iou) * w) / target_scores_sum
    if cfg.nwd_loss:
        nwd = wasserstein_loss(pred_bboxes, target_bboxes_feat)[..., 0]
        loss_nwd = jnp.sum((1.0 - nwd) * w) / target_scores_sum
        loss_iou = cfg.iou_ratio * loss_iou + (1.0 - cfg.iou_ratio) * loss_nwd

    # --- dfl (loss.py:224-231) ---
    target_ltrb = bbox2dist(anchor_points[None], target_bboxes_feat, reg_max - 1)
    dfl = _dfl_loss(pred_distri.reshape(b, -1, 4, reg_max), target_ltrb, reg_max)[..., 0]
    loss_dfl = jnp.sum(dfl * w) / target_scores_sum

    any_fg = jnp.any(fg_mask)
    loss_iou = jnp.where(any_fg, loss_iou, 0.0)
    loss_dfl = jnp.where(any_fg, loss_dfl, 0.0)

    items = jnp.stack([loss_iou * cfg.box, loss_cls * cfg.cls, loss_dfl * cfg.dfl])
    total = jnp.sum(items) * b
    return total, items, LossState(updates=new_updates, iou_mean=new_iou_mean)
