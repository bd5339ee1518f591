"""RT-DETR detection loss (reference models/utils/loss.py DETRLoss /
RTDETRDetectionLoss + ops.py HungarianMatcher).

TPU-first redesign around the repo's static padded-GT batches:

- GT comes in as (B, M) cls / (B, M, 4) normalized xywh / (B, M) validity —
  no ragged per-image lists.
- The Hungarian assignment runs as a ``jax.pure_callback`` to
  scipy.optimize.linear_sum_assignment on the (B, nq, M) cost with invalid
  GT columns given a huge cost; the callback returns a static (B, M) array
  of matched query indices. Everything around it stays compiled.
- The CDN (denoising) branch reuses the static group layout built by
  nn/transformer.static_cdn_group: positives for group g live at dn slot
  2*g*M + j for gt j, so the dn "match" is an index formula, not a matcher
  (reference get_dn_match_indices).

Loss terms match the reference: focal class loss with IoU-weighted targets,
L1 box loss, GIoU loss, each summed over matched pairs / num_gt, with the
reference gains (class 1, bbox 5, giou 2) and auxiliary losses from every
decoder layer.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bsyolo_tpu.ops.boxes import bbox_iou, xywh2xyxy

Array = jax.Array

CLS_GAIN, BBOX_GAIN, GIOU_GAIN = 1.0, 5.0, 2.0
MATCH_CLS, MATCH_BBOX, MATCH_GIOU = 2.0, 5.0, 2.0
FL_ALPHA, FL_GAMMA = 0.25, 2.0
BIG = 1e6


def _host_assign(cost: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """(B, nq, M) cost + (B, M) validity -> (B, M) matched query per gt (-1
    for invalid gts). scipy Hungarian per image on the valid columns."""
    from scipy.optimize import linear_sum_assignment

    B, nq, M = cost.shape
    out = np.full((B, M), -1, np.int32)
    for b in range(B):
        cols = np.flatnonzero(valid[b])
        if len(cols) == 0:
            continue
        c = cost[b][:, cols]
        c = np.nan_to_num(c, nan=0.0, posinf=0.0, neginf=0.0)
        rows, cids = linear_sum_assignment(c)
        out[b, cols[cids]] = rows.astype(np.int32)
    return out


def hungarian_match(
    pred_bboxes: Array,  # (B, nq, 4) normalized xywh
    pred_scores: Array,  # (B, nq, nc) raw logits
    gt_cls: Array,  # (B, M)
    gt_bboxes: Array,  # (B, M, 4) normalized xywh
    gt_mask: Array,  # (B, M)
) -> Array:
    """Static-shape Hungarian matching (reference HungarianMatcher.forward)."""
    B, nq, nc = pred_scores.shape
    M = gt_cls.shape[1]
    ps = jax.nn.sigmoid(jax.lax.stop_gradient(pred_scores).astype(jnp.float32))
    pb = jax.lax.stop_gradient(pred_bboxes).astype(jnp.float32)
    gc = jnp.clip(gt_cls, 0, nc - 1)
    # focal-style class cost at the gt class (matcher use_fl path)
    p = jnp.take_along_axis(ps, gc[:, None, :], axis=2)  # (B, nq, M) via broadcast gather
    neg = (1 - FL_ALPHA) * (p**FL_GAMMA) * (-jnp.log(1 - p + 1e-8))
    pos = FL_ALPHA * ((1 - p) ** FL_GAMMA) * (-jnp.log(p + 1e-8))
    cost_cls = pos - neg
    cost_l1 = jnp.sum(jnp.abs(pb[:, :, None] - gt_bboxes[:, None, :]), axis=-1)
    giou = bbox_iou(pb[:, :, None], gt_bboxes[:, None, :], xywh=True, GIoU=True)
    cost = MATCH_CLS * cost_cls + MATCH_BBOX * cost_l1 + MATCH_GIOU * (1.0 - giou.squeeze(-1))
    cost = jnp.nan_to_num(cost, nan=0.0, posinf=0.0, neginf=0.0)
    assign = jax.pure_callback(
        _host_assign,
        jax.ShapeDtypeStruct((B, M), jnp.int32),
        cost,
        gt_mask > 0,
        vmap_method="sequential",
    )
    return assign  # (B, M) query index per gt, -1 invalid


def _pair_losses(
    pred_bboxes: Array,  # (B, nq, 4)
    pred_scores: Array,  # (B, nq, nc)
    gt_cls: Array,
    gt_bboxes: Array,
    assign: Array,  # (B, M) query idx per gt (-1 invalid)
    valid: Array,  # (B, M) bool
) -> Tuple[Array, Array, Array]:
    """class/bbox/giou losses for one prediction set given an assignment."""
    B, nq, nc = pred_scores.shape
    num_gt = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)

    safe_q = jnp.maximum(assign, 0)
    pb = jnp.take_along_axis(pred_bboxes, safe_q[..., None], axis=1)  # (B, M, 4)
    vf = valid.astype(jnp.float32)[..., None]

    # L1 + GIoU over matched pairs (reference _get_loss_bbox)
    l1 = jnp.sum(jnp.abs(pb - gt_bboxes) * vf) / num_gt
    giou = bbox_iou(pb, gt_bboxes, xywh=True, GIoU=True).squeeze(-1)
    giou_loss = jnp.sum((1.0 - giou) * vf.squeeze(-1)) / num_gt

    # focal class loss with IoU-weighted one-hot (reference _get_loss_class)
    iou_w = bbox_iou(jax.lax.stop_gradient(pb), gt_bboxes, xywh=True).squeeze(-1)
    targets = jnp.zeros((B, nq), jnp.int32) + nc  # background
    tgt_cls = jnp.where(valid, jnp.clip(gt_cls, 0, nc - 1), nc)
    # scatter gt class + iou score onto matched query slots
    targets = _scatter_rows(targets, safe_q, tgt_cls, valid)
    gt_scores = _scatter_rows(jnp.zeros((B, nq), jnp.float32), safe_q, iou_w, valid)
    one_hot = jax.nn.one_hot(targets, nc + 1)[..., :-1]  # background drops out
    gt_soft = gt_scores[..., None] * one_hot

    p = jax.nn.sigmoid(pred_scores.astype(jnp.float32))
    ce = -(gt_soft * jnp.log(p + 1e-9) + (1 - gt_soft) * jnp.log(1 - p + 1e-9))
    p_t = one_hot * p + (1 - one_hot) * (1 - p)
    alpha_t = one_hot * FL_ALPHA + (1 - one_hot) * (1 - FL_ALPHA)
    fl = alpha_t * ((1 - p_t) ** FL_GAMMA) * ce
    # reference FocalLoss: mean over classes, sum over queries+batch; then
    # loss_cls /= max(num_gts, 1) / nq
    loss_cls = jnp.sum(jnp.mean(fl, axis=-1)) / (num_gt / nq)

    return loss_cls * CLS_GAIN, l1 * BBOX_GAIN, giou_loss * GIOU_GAIN


def _scatter_rows(base: Array, idx: Array, val: Array, valid: Array) -> Array:
    """base (B, nq); scatter val (B, M) at idx (B, M) where valid.

    Invalid slots are routed to a throwaway column nq (NOT clamped to 0 —
    clamping would make every padded GT slot overwrite whatever real GT was
    assigned to query 0)."""
    B, M = idx.shape
    nq = base.shape[1]
    bi = jnp.arange(B)[:, None].repeat(M, 1)
    safe = jnp.where(valid, idx, nq)
    padded = jnp.concatenate([base, jnp.zeros((B, 1), base.dtype)], axis=1)
    return padded.at[bi, safe].set(val.astype(base.dtype))[:, :nq]


def rtdetr_loss(outputs: Dict[str, Array], gt_cls, gt_bboxes, gt_mask):
    """Full RT-DETR training loss over decoder layers + encoder + denoising.

    outputs: the RTDETRDecoder train-mode dict (dec_bboxes (L, B, Q', 4),
    dec_scores, enc_bboxes, enc_scores, optional dn_*). Q' = num_dn + nq.
    Returns (total, items[cls, bbox, giou]).
    """
    gt_mask = gt_mask > 0
    db, ds = outputs["dec_bboxes"], outputs["dec_scores"]
    L = db.shape[0]
    num_dn = 0
    dn_meta = outputs.get("dn_meta")
    if dn_meta is not None:
        num_dn = dn_meta["num_dn"]
    mb, ms = db[..., num_dn:, :], ds[..., num_dn:, :]

    # main + aux: match on the LAST layer? reference matches per layer
    totals = jnp.zeros(3, jnp.float32)
    for i in range(L):
        assign = hungarian_match(mb[i], ms[i], gt_cls, gt_bboxes, gt_mask)
        c, b, g = _pair_losses(mb[i], ms[i], gt_cls, gt_bboxes, assign, gt_mask)
        totals = totals + jnp.stack([c, b, g])

    # encoder head loss (reference trains enc_bboxes/enc_scores as an aux
    # layer via dec stacking in RTDETRDetectionLoss preds)
    assign = hungarian_match(outputs["enc_bboxes"], outputs["enc_scores"], gt_cls, gt_bboxes, gt_mask)
    c, b, g = _pair_losses(
        outputs["enc_bboxes"], outputs["enc_scores"], gt_cls, gt_bboxes, assign, gt_mask
    )
    totals = totals + jnp.stack([c, b, g])

    # denoising branch: positives at dn slot 2*g*M + j by construction
    if dn_meta is not None:
        M = dn_meta["M"]
        G = dn_meta["num_group"]
        for i in range(L):
            dnb, dns = db[i][:, :num_dn], ds[i][:, :num_dn]
            for g_i in range(G):
                sl = slice(2 * g_i * M, 2 * g_i * M + M)  # positive half of the group
                pb, ps = dnb[:, sl], dns[:, sl]
                ident = jnp.where(gt_mask, jnp.arange(M)[None, :], -1)
                c, b, g = _pair_losses(pb, ps, gt_cls, gt_bboxes, ident, gt_mask)
                totals = totals + jnp.stack([c, b, g]) / G  # average over groups

    total = jnp.sum(totals)
    return total, totals
