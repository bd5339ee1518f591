"""Task-aligned assigner, static-shape formulation.

Reference: ultralytics/utils/tal.py:51-335 (TaskAlignedAssigner). The
reference leans on boolean fancy indexing and data-dependent shapes; this
version is a dense masked computation over (batch, max_gt, anchors) so the
whole assignment jits into one fused XLA program (it also runs under
`stop_gradient` semantics by construction — callers pass detached inputs).

Deviation noted for the record: the reference scatter-adds top-k indices even
for invalid (padded) ground-truth rows after zero-filling their indices, then
wipes count>1 anchors; since top-k indices within a valid row are distinct and
invalid rows are masked out downstream anyway, we scatter `1 * row_valid`
directly — same result, no index-0 pollution.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bsyolo_tpu.ops.boxes import bbox_iou

Array = jax.Array


class AssignResult(NamedTuple):
    target_labels: Array  # (b, A) int32
    target_bboxes: Array  # (b, A, 4) xyxy (same units as inputs)
    target_scores: Array  # (b, A, nc) float
    fg_mask: Array  # (b, A) bool
    target_gt_idx: Array  # (b, A) int32


def _select_candidates_in_gts(anc_points: Array, gt_bboxes: Array, eps: float = 1e-9) -> Array:
    """(A, 2) anchors inside (b, M, 4) xyxy boxes -> (b, M, A) bool (tal.py:280).

    min(lt)/min(rb) reduced separately — no (b, M, A, 4) concat materialized."""
    lt = anc_points[None, None, :, :] - gt_bboxes[:, :, None, :2]
    rb = gt_bboxes[:, :, None, 2:] - anc_points[None, None, :, :]
    return jnp.minimum(jnp.min(lt, axis=-1), jnp.min(rb, axis=-1)) > eps


def _kth_largest(x: Array, k: int) -> Array:
    """k-th largest value along the last axis, keepdims — via k-1 masked max
    passes instead of a sort (lax.top_k sorts: ~13x slower on TPU at the
    assigner's (b, M, 8400) shape). Duplicated values are counted once, so
    with d < k distinct values the result is -inf — callers treating this as
    a >= threshold then select every finite entry, which matches top-k's
    behavior of returning all positives when positives are scarce."""

    def body(_, t):
        return jnp.max(jnp.where(x < t, x, -jnp.inf), axis=-1, keepdims=True)

    t = jnp.max(x, axis=-1, keepdims=True)
    return jax.lax.fori_loop(0, k - 1, body, t) if k > 1 else t


@partial(jax.jit, static_argnames=("topk", "num_classes", "alpha", "beta", "bf16"))
def task_aligned_assign(
    pd_scores: Array,  # (b, A, nc) sigmoided
    pd_bboxes: Array,  # (b, A, 4) xyxy
    anc_points: Array,  # (A, 2)
    gt_labels: Array,  # (b, M) int
    gt_bboxes: Array,  # (b, M, 4) xyxy
    mask_gt: Array,  # (b, M) bool/float
    topk: int = 10,
    num_classes: int = 80,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
    bf16: bool = False,
) -> AssignResult:
    """Static-shape task-aligned assignment (reference tal.py:77-167).

    ``bf16=True`` runs the dense (b, M, A) metric computation in bfloat16 —
    the assignment carries no gradients and is HBM-bound (each (b, M, A) f32
    tensor is 275 MB at batch 128), so halving the bytes halves its cost.
    Selection can differ from f32 only where two anchors' metrics agree to
    bf16 precision (equally-good candidates); target VALUES (boxes, labels)
    are gathered from the full-precision inputs either way, and the returned
    target_scores are cast back to the input dtype.
    """
    out_dtype = pd_scores.dtype
    gt_bboxes_full = gt_bboxes
    b, A, nc = pd_scores.shape
    M = gt_bboxes.shape[1]
    mask_gt = mask_gt.astype(jnp.bool_)

    # the center-inside test stays full precision even under bf16: it is a
    # hard geometric rule (bf16 is ±2 px at 640-scale coords, flipping
    # anchors near box edges in/out), and it costs one cheap fused pass
    mask_in_gts = _select_candidates_in_gts(anc_points, gt_bboxes)  # (b, M, A)
    mask_valid = mask_in_gts & mask_gt[:, :, None]

    if bf16:
        # only the dense RANKING math drops to bf16 — metric perturbations
        # there just prefer a nearly-equivalent anchor
        pd_scores = pd_scores.astype(jnp.bfloat16)
        pd_bboxes = pd_bboxes.astype(jnp.bfloat16)
        gt_bboxes = gt_bboxes.astype(jnp.bfloat16)

    # alignment metric: score[gt_label]^alpha * CIoU^beta (tal.py:169-194)
    labels = jnp.clip(gt_labels.astype(jnp.int32), 0, nc - 1)
    bbox_scores = jnp.take_along_axis(
        pd_scores[:, None, :, :],  # (b, 1, A, nc)
        labels[:, :, None, None],  # (b, M, 1, 1)
        axis=-1,
    )[..., 0]  # (b, M, A)
    bbox_scores = jnp.where(mask_valid, bbox_scores, 0.0)

    overlaps = bbox_iou(
        gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :], xywh=False, CIoU=True
    )[..., 0]
    overlaps = jnp.where(mask_valid, jnp.clip(overlaps, 0.0), 0.0)

    align_metric = bbox_scores**alpha * overlaps**beta

    # top-k candidates per gt (tal.py:195-230). TPU-first: instead of the
    # reference's top-k + scatter-add of indices (torch scatter; and
    # lax.top_k over (b, M, 8400) measures ~38 ms at batch 64 — it sorts),
    # compare against the k-th largest VALUE, computed by k-1 iterated
    # masked max-reductions (~3 ms: k streaming passes, no sort). Inside a
    # valid row this selects the same anchors except EXACT float ties at
    # the threshold: the reference's top_k breaks such ties arbitrarily
    # (lowest index) and keeps exactly k, while >= kth keeps every tied
    # anchor. In practice ties above zero need bit-identical score*CIoU
    # products (duplicated GT geometry / saturated scores); when they do
    # occur the extra tied anchors are equally-good positives and only
    # dilute that GT's target-score normalization marginally — an accepted,
    # documented divergence, NOT an impossibility. Ties at metric==0
    # (CIoU clipped) carry zero weight either way and don't matter. Rows
    # with fewer than k distinct positive metrics threshold at -inf and
    # keep every positive anchor — also what the reference's top-k does.
    # The positivity cut is STRICT > 0, not > eps: beta=6 makes tiny-IoU
    # metrics legitimately ~1e-10 and the reference keeps them.
    k = min(topk, A)
    kth = _kth_largest(align_metric, k)  # (b, M, 1)
    mask_topk = (align_metric >= kth) & (align_metric > 0.0)
    mask_pos = mask_topk & mask_valid  # (b, M, A)

    # resolve anchors claimed by multiple gts: keep highest CIoU (tal.py:303-334)
    fg_counts = jnp.sum(mask_pos.astype(jnp.int32), axis=1)  # (b, A)
    multi = fg_counts[:, None, :] > 1  # (b, 1, A) -> broadcast over M
    max_overlaps_idx = jnp.argmax(overlaps, axis=1)  # (b, A)
    is_max = jax.nn.one_hot(max_overlaps_idx, M, axis=1, dtype=jnp.bool_)  # (b, M, A)
    mask_pos = jnp.where(multi, is_max, mask_pos)
    fg_mask = jnp.sum(mask_pos.astype(jnp.int32), axis=1) > 0  # (b, A)
    target_gt_idx = jnp.argmax(mask_pos, axis=1).astype(jnp.int32)  # (b, A)

    # gather targets (tal.py:232-278) — values come from the FULL-precision
    # boxes regardless of the metric compute dtype
    target_labels = jnp.take_along_axis(labels, target_gt_idx, axis=1)  # (b, A)
    target_bboxes = jnp.take_along_axis(gt_bboxes_full, target_gt_idx[..., None], axis=1)  # (b, A, 4)
    target_scores = jax.nn.one_hot(target_labels, nc, dtype=out_dtype)
    target_scores = target_scores * fg_mask[..., None]

    # normalize by per-gt max alignment (tal.py:146-156)
    align_metric = align_metric * mask_pos
    pos_align = jnp.max(align_metric, axis=-1, keepdims=True)  # (b, M, 1)
    pos_overlaps = jnp.max(overlaps * mask_pos, axis=-1, keepdims=True)  # (b, M, 1)
    norm = jnp.max(align_metric * pos_overlaps / (pos_align + eps), axis=-2)  # (b, A)
    target_scores = target_scores * norm.astype(out_dtype)[..., None]

    return AssignResult(target_labels, target_bboxes, target_scores, fg_mask, target_gt_idx)
