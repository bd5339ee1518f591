"""Static-shape non-max suppression for TPU.

TPU-first redesign of the reference NMS (ultralytics/utils/ops.py:167-317):
the reference returns a variable-length tensor per image via torchvision NMS
on the host GPU; under XLA every shape must be static, so this version returns
a fixed ``(max_det, 6)`` tensor per image with zero-score padding.

Algorithm: top-``pre_k`` candidate selection (multi-label, class-offset trick
like the reference's ``c = cls * max_wh``), then exact greedy suppression via
fixed-point iteration on the candidate IoU matrix:

    K_{t+1}[j] = not exists i<j with K_t[i] and IoU(i,j) > thresh

Starting from "all kept", this converges to the greedy NMS solution in
O(longest suppression chain) iterations; each iteration is one dense
(pre_k, pre_k) masked reduction that maps cleanly onto the VPU — no
sequential per-box loop of length pre_k.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from bsyolo_tpu.ops.boxes import box_iou_pairwise, xywh2xyxy

Array = jax.Array


def _greedy_keep(iou: Array, valid: Array, iou_thres: float, max_iters: int | None = None) -> Array:
    """Exact greedy-NMS keep mask via fixed-point iteration.

    Args:
        iou: (k, k) IoU matrix of score-sorted candidates (desc).
        valid: (k,) candidate validity (score above threshold).
        max_iters: iteration cap; defaults to k so even a length-k suppression
            chain converges (the while_loop exits early at the fixed point, so
            typical cost is a handful of iterations regardless).
    """
    k = iou.shape[0]
    if max_iters is None:
        max_iters = k
    # sup[i, j]: valid i earlier in score order would suppress j if i is kept
    upper = jnp.triu(jnp.ones((k, k), dtype=bool), k=1)  # i < j
    sup = (iou > iou_thres) & upper & valid[:, None]

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(it < max_iters, jnp.any(keep != prev))

    def body(state):
        keep, _, it = state
        suppressed = jnp.any(sup & keep[:, None], axis=0)
        new_keep = valid & ~suppressed
        return new_keep, keep, it + 1

    keep0 = valid
    keep, _, _ = jax.lax.while_loop(cond, body, (keep0, ~keep0, jnp.int32(0)))
    return keep


def _nms_single(
    pred: Array,
    conf_thres: float,
    iou_thres: float,
    max_det: int,
    pre_k: int,
    nc: int,
    multi_label: bool,
    agnostic: bool,
    max_wh: float,
) -> Array:
    """NMS for one image. pred: (A, 4+nc) with xywh box + per-class scores."""
    num_anchors = pred.shape[0]
    boxes = xywh2xyxy(pred[:, :4])  # (A, 4)
    scores = pred[:, 4:]  # (A, nc)

    if multi_label and nc > 1:
        # two-stage candidate selection: top anchors by max-class score first,
        # then a multi-label top-k within the survivors. Avoids sorting the
        # full (A*nc) score matrix (672k entries for 8400x80) — same result
        # unless a candidate's anchor falls outside the anchor top-k, which at
        # pre_k >= max_det candidates is immaterial to mAP.
        ka = min(pre_k, num_anchors)
        best_score = jnp.max(scores, axis=-1)  # (A,)
        _, top_anchors = jax.lax.top_k(best_score, ka)
        sub = scores[top_anchors]  # (ka, nc)
        k = min(pre_k, ka * nc)
        cand_scores, flat_idx = jax.lax.top_k(sub.reshape(-1), k)
        anchor_idx = top_anchors[flat_idx // nc]
        cls_idx = (flat_idx % nc).astype(jnp.float32)
    else:
        best_cls = jnp.argmax(scores, axis=-1)
        best_score = jnp.max(scores, axis=-1)
        k = min(pre_k, num_anchors)
        cand_scores, anchor_idx = jax.lax.top_k(best_score, k)
        cls_idx = best_cls[anchor_idx].astype(jnp.float32)

    valid = cand_scores > conf_thres
    cand_boxes = boxes[anchor_idx]  # (k, 4)
    offset = jnp.zeros((k, 1), dtype=cand_boxes.dtype) if agnostic else cls_idx[:, None] * max_wh
    iou = box_iou_pairwise(cand_boxes + offset, cand_boxes + offset)  # (k, k)
    keep = _greedy_keep(iou, valid, iou_thres)

    # Select top max_det kept candidates (already score-sorted; stable mask-select)
    keep_scores = jnp.where(keep, cand_scores, -1.0)
    out_scores, out_idx = jax.lax.top_k(keep_scores, min(max_det, k))
    sel_boxes = cand_boxes[out_idx]
    sel_cls = cls_idx[out_idx]
    sel_anchor = anchor_idx[out_idx]
    ok = out_scores > 0
    out = jnp.concatenate(
        [
            jnp.where(ok[:, None], sel_boxes, 0.0),
            jnp.where(ok, out_scores, 0.0)[:, None],
            jnp.where(ok, sel_cls, -1.0)[:, None],
        ],
        axis=-1,
    )
    sel_anchor = jnp.where(ok, sel_anchor, -1)
    if max_det > k:  # pad if caller asked for more than pre_k slots
        pad = jnp.zeros((max_det - k, 6), dtype=out.dtype)
        pad = pad.at[:, 5].set(-1.0)
        out = jnp.concatenate([out, pad], axis=0)
        sel_anchor = jnp.concatenate([sel_anchor, jnp.full((max_det - k,), -1, sel_anchor.dtype)])
    return out, sel_anchor


def _nms_single_logits(
    boxes: Array,  # (A, 4) xyxy pixels, already decoded
    cls_logits: Array,  # (A, nc) RAW class logits (pre-sigmoid)
    best_logit: Array,  # (A,) max class logit per anchor
    conf_thres: float,
    iou_thres: float,
    max_det: int,
    pre_k: int,
    multi_label: bool,
    agnostic: bool,
    max_wh: float,
):
    """Logit-domain NMS for one image: sigmoid is monotonic, so candidate
    top-k ranks raw logits identically to sigmoided scores — only the
    selected ``pre_k`` candidates are ever sigmoided, and the dense
    (A, nc) score tensor is never materialized."""
    num_anchors, nc = cls_logits.shape
    ka = min(pre_k, num_anchors)
    _, top_anchors = jax.lax.top_k(best_logit, ka)
    sub = cls_logits[top_anchors].astype(jnp.float32)  # (ka, nc)
    if multi_label and nc > 1:
        k = min(pre_k, ka * nc)
        cand_logits, flat_idx = jax.lax.top_k(sub.reshape(-1), k)
        rel = flat_idx // nc
        cls_idx = (flat_idx % nc).astype(jnp.float32)
    else:
        k = ka
        cand_logits = jnp.max(sub, axis=-1)
        rel = jnp.arange(ka)
        cls_idx = jnp.argmax(sub, axis=-1).astype(jnp.float32)
    cand_scores = jax.nn.sigmoid(cand_logits)
    anchor_idx = top_anchors[rel]
    cand_boxes = boxes[anchor_idx]

    valid = cand_scores > conf_thres
    offset = jnp.zeros((k, 1), dtype=cand_boxes.dtype) if agnostic else cls_idx[:, None] * max_wh
    iou = box_iou_pairwise(cand_boxes + offset, cand_boxes + offset)
    keep = _greedy_keep(iou, valid, iou_thres)

    keep_scores = jnp.where(keep, cand_scores, -1.0)
    out_scores, out_idx = jax.lax.top_k(keep_scores, min(max_det, k))
    sel_boxes = cand_boxes[out_idx]
    sel_cls = cls_idx[out_idx]
    sel_anchor = anchor_idx[out_idx]
    ok = out_scores > 0
    out = jnp.concatenate(
        [
            jnp.where(ok[:, None], sel_boxes, 0.0),
            jnp.where(ok, out_scores, 0.0)[:, None],
            jnp.where(ok, sel_cls, -1.0)[:, None],
        ],
        axis=-1,
    )
    sel_anchor = jnp.where(ok, sel_anchor, -1)
    if max_det > k:
        pad = jnp.zeros((max_det - k, 6), dtype=out.dtype)
        pad = pad.at[:, 5].set(-1.0)
        out = jnp.concatenate([out, pad], axis=0)
        sel_anchor = jnp.concatenate([sel_anchor, jnp.full((max_det - k,), -1, sel_anchor.dtype)])
    return out, sel_anchor


@partial(
    jax.jit,
    static_argnames=(
        "conf_thres",
        "iou_thres",
        "max_det",
        "pre_k",
        "multi_label",
        "agnostic",
        "max_wh",
        "return_idx",
    ),
)
def nms_from_logits(
    boxes: Array,  # (B, A, 4) xyxy pixels
    cls_logits: Array,  # (B, A, nc) raw class logits
    best_logit: Array,  # (B, A)
    conf_thres: float = 0.25,
    iou_thres: float = 0.7,
    max_det: int = 300,
    pre_k: int = 1024,
    multi_label: bool = True,
    agnostic: bool = False,
    max_wh: float = 7680.0,
    return_idx: bool = False,
):
    """Batched logit-domain NMS (fused fast path; see _nms_single_logits).

    Same contract as :func:`non_max_suppression` — (B, max_det, 6) xyxy,
    conf, cls with zero-score padding — but consumes decoded xyxy boxes and
    raw logits so decode+threshold+top-k can fuse with the Pallas decode
    kernel upstream (kernels/decode.py fused_box_best_pallas)."""
    fn = lambda b, c, m: _nms_single_logits(
        b, c, m, conf_thres, iou_thres, max_det, pre_k, multi_label, agnostic, max_wh
    )
    out, idx = jax.vmap(fn)(boxes.astype(jnp.float32), cls_logits, best_logit)
    return (out, idx) if return_idx else out


@partial(
    jax.jit,
    static_argnames=(
        "conf_thres",
        "iou_thres",
        "max_det",
        "pre_k",
        "nc",
        "multi_label",
        "agnostic",
        "max_wh",
        "return_idx",
    ),
)
def non_max_suppression(
    prediction: Array,
    conf_thres: float = 0.25,
    iou_thres: float = 0.7,
    max_det: int = 300,
    pre_k: int = 1024,
    nc: int = 0,
    multi_label: bool = True,
    agnostic: bool = False,
    max_wh: float = 7680.0,
    return_idx: bool = False,
) -> Array:
    """Batched static-shape NMS.

    Args:
        prediction: (B, A, 4+nc) decoded preds — xywh box (pixels) + sigmoided
            per-class scores (the layout produced by the Detect head,
            reference head.py:100-131, transposed to anchors-first).
        nc: number of classes (inferred from shape if 0).

    Returns:
        (B, max_det, 6) float32: x1, y1, x2, y2, conf, cls — zero-padded rows
        have conf == 0 and cls == -1. With return_idx=True also returns
        (B, max_det) int32 source-anchor indices (-1 for padding), used to
        gather per-anchor extras (mask coefficients, keypoints, angles).
    """
    if nc <= 0:
        nc = prediction.shape[-1] - 4
    fn = lambda p: _nms_single(
        p, conf_thres, iou_thres, max_det, pre_k, nc, multi_label, agnostic, max_wh
    )
    out, idx = jax.vmap(fn)(prediction.astype(jnp.float32))
    return (out, idx) if return_idx else out
