"""SAM promptable-segmentation predictor (reference models/sam/predict.py).

TPU-first design:

- ``set_image`` runs the heavy image encoder ONCE per image under jit
  (bf16-capable); all subsequent prompts reuse the cached embedding —
  exactly the reference Predictor's features cache, but as an explicit
  two-stage compiled pipeline.
- Prompts are STATIC: points/boxes are packed into a fixed (B, P) labelled
  point tensor (pad label -1), so any number of user prompts up to the
  compiled capacity re-uses one executable.
- ``generate`` (reference predict.py:375 / amg.py): the point grid is a
  single (G, 1) prompt batch driven through the decoder in fixed-size
  chunks with ``jax.lax.map``-style batching; stability + IoU filtering
  and mask-box NMS run on device with static shapes.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# reference SAMModel normalization constants (modules/sam.py:61)
PIXEL_MEAN = np.asarray([123.675, 116.28, 103.53], np.float32)
PIXEL_STD = np.asarray([58.395, 57.12, 57.375], np.float32)


class SAMPredictor:
    """Two-stage (encode once, prompt many) SAM predictor."""

    def __init__(self, model, variables, img_size: int = 1024, max_points: int = 8):
        self.model = model
        self.variables = variables
        self.img_size = img_size
        self.max_points = max_points
        self._encode = jax.jit(lambda v, x: model.apply(v, x, method=model.encode))
        self._decode = jax.jit(
            lambda v, emb, c, l: model.apply(v, emb, c, l, True, method=model.decode)
        )
        self._decode_single = jax.jit(
            lambda v, emb, c, l: model.apply(v, emb, c, l, False, method=model.decode)
        )
        self._emb = None
        self._scale = 1.0
        self._orig_hw: Tuple[int, int] = (0, 0)
        self._in_hw: Tuple[int, int] = (0, 0)

    # --- stage 1: image embedding ------------------------------------
    def preprocess(self, img: np.ndarray) -> np.ndarray:
        """Longest-side resize to img_size + bottom/right zero pad + SAM
        normalization (reference predict.py pre_transform / SAMModel mean-std)."""
        import cv2

        h, w = img.shape[:2]
        scale = self.img_size / max(h, w)
        nh, nw = round(h * scale), round(w * scale)
        resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        out = np.zeros((self.img_size, self.img_size, 3), np.float32)
        out[:nh, :nw] = (resized.astype(np.float32) - PIXEL_MEAN) / PIXEL_STD
        self._scale = scale
        self._orig_hw = (h, w)
        self._in_hw = (nh, nw)
        return out

    def set_image(self, img: np.ndarray):
        """Encode one HWC uint8/float image; caches the embedding."""
        x = self.preprocess(img)[None]
        self._emb = self._encode(self.variables, jnp.asarray(x))
        self._img = img
        return self

    # --- stage 2: prompting ------------------------------------------
    def _pack_prompts(self, points, labels, bboxes) -> Tuple[np.ndarray, np.ndarray]:
        """points (N,2) + labels (N,) + bboxes (M,4 xyxy), original-image
        pixels -> one static (B, P, 2)/(B, P) labelled set per prompt group.
        Each box or point becomes its own prompt group (SAM semantics:
        one output mask per box; points combine into one group)."""
        P = self.max_points
        groups = []
        if bboxes is not None:
            for b in np.asarray(bboxes, np.float32).reshape(-1, 4):
                c = np.zeros((P, 2), np.float32)
                l = -np.ones((P,), np.int32)
                c[0] = b[:2] * self._scale
                c[1] = b[2:] * self._scale
                l[0], l[1] = 2, 3
                groups.append((c, l))
        if points is not None:
            pts = np.asarray(points, np.float32).reshape(-1, 2) * self._scale
            lab = (np.ones(len(pts), np.int32) if labels is None
                   else np.asarray(labels, np.int32).reshape(-1))
            c = np.zeros((P, 2), np.float32)
            l = -np.ones((P,), np.int32)
            n = min(len(pts), P - 1)  # keep one pad slot (reference pads points)
            c[:n] = pts[:n]
            l[:n] = lab[:n]
            groups.append((c, l))
        if not groups:
            raise ValueError("provide points= and/or bboxes= (original-image pixels)")
        coords = np.stack([g[0] for g in groups])
        labs = np.stack([g[1] for g in groups])
        return coords, labs

    def _masks_to_original(self, low_masks: jnp.ndarray) -> np.ndarray:
        """(B, nm, 4g, 4g) logits -> (B*nm, H, W) bool in original pixels."""
        import cv2

        m = np.asarray(low_masks.astype(jnp.float32))
        B, nm, mh, mw = m.shape
        nh, nw = self._in_hw
        h, w = self._orig_hw
        # low-res mask covers the full padded square; crop the valid part
        out = np.zeros((B * nm, h, w), bool)
        frac_h = int(round(mh * (nh / self.img_size)))
        frac_w = int(round(mw * (nw / self.img_size)))
        for i in range(B * nm):
            mm = m.reshape(B * nm, mh, mw)[i, :frac_h, :frac_w]
            out[i] = cv2.resize(mm, (w, h), interpolation=cv2.INTER_LINEAR) > 0.0
        return out

    def __call__(
        self,
        points=None,
        labels=None,
        bboxes=None,
        multimask_output: bool = False,
    ):
        """Prompted segmentation on the current image -> Results."""
        from bsyolo_tpu.engine.results import Results

        if self._emb is None:
            raise RuntimeError("call set_image(img) first")
        coords, labs = self._pack_prompts(points, labels, bboxes)
        fn = self._decode if multimask_output else self._decode_single
        masks, iou = fn(self.variables, self._emb, jnp.asarray(coords), jnp.asarray(labs))
        m = self._masks_to_original(masks)
        iou = np.asarray(iou).reshape(-1)
        boxes = _batched_mask_to_box(m)
        data = np.concatenate(
            [boxes, iou[:, None], np.zeros((len(m), 1), np.float32)], axis=1
        ).astype(np.float32)
        return Results(self._img, "", {0: "object"}, boxes=data, masks=m)

    # --- automatic mask generation -----------------------------------
    def generate(
        self,
        points_per_side: int = 32,
        points_per_batch: int = 64,
        conf_thres: float = 0.88,
        stability_score_thresh: float = 0.95,
        stability_score_offset: float = 1.0,
        nms_iou: float = 0.7,
        max_masks: int = 256,
    ):
        """Segment everything: grid prompts -> filter -> dedup
        (reference predict.py:375 generate, amg.py helpers)."""
        from bsyolo_tpu.engine.results import Results
        from bsyolo_tpu.ops.nms import non_max_suppression

        if self._emb is None:
            raise RuntimeError("call set_image(img) first")
        g = points_per_side
        nh, nw = self._in_hw
        # grid over the VALID (unpadded) region, in input pixels
        gy = (np.arange(g) + 0.5) / g * nh
        gx = (np.arange(g) + 0.5) / g * nw
        pts = np.stack(np.meshgrid(gx, gy, indexing="xy"), -1).reshape(-1, 2)

        P = self.max_points
        all_masks, all_scores = [], []
        for i in range(0, len(pts), points_per_batch):
            chunk = pts[i : i + points_per_batch]
            B = points_per_batch
            coords = np.zeros((B, P, 2), np.float32)
            labs = -np.ones((B, P), np.int32)
            coords[: len(chunk), 0] = chunk
            labs[: len(chunk), 0] = 1
            masks, iou = self._decode(self.variables, self._emb, jnp.asarray(coords), jnp.asarray(labs))
            lm = np.asarray(masks.astype(jnp.float32)).reshape(-1, masks.shape[2], masks.shape[3])
            sc = np.asarray(iou).reshape(-1)
            valid = np.repeat(np.arange(B) < len(chunk), masks.shape[1])
            # stability score (reference amg.py calculate_stability_score)
            hi = (lm > stability_score_offset).sum((1, 2)).astype(np.float32)
            lo = (lm > -stability_score_offset).sum((1, 2)).astype(np.float32)
            stab = np.where(lo > 0, hi / np.maximum(lo, 1), 1.0)
            keep = valid & (sc > conf_thres) & (stab >= stability_score_thresh)
            all_masks.append(lm[keep])
            all_scores.append(sc[keep])
        if not all_masks or sum(len(m) for m in all_masks) == 0:
            return Results(self._img, "", {0: "object"})
        lm = np.concatenate(all_masks)
        sc = np.concatenate(all_scores)
        binm = lm > 0.0
        boxes_low = _batched_mask_to_box(binm)  # low-res pixel units
        # greedy NMS over mask boxes (scores = predicted IoU)
        order = np.argsort(-sc)
        keep_idx: List[int] = []
        for j in order:
            b = boxes_low[j]
            ok = True
            for kk in keep_idx:
                if _box_iou(b, boxes_low[kk]) > nms_iou:
                    ok = False
                    break
            if ok:
                keep_idx.append(j)
            if len(keep_idx) >= max_masks:
                break
        lm = lm[keep_idx]
        sc = sc[keep_idx]
        m = self._masks_to_original(jnp.asarray(lm[:, None]))
        boxes = _batched_mask_to_box(m)
        data = np.concatenate(
            [boxes, sc[:, None], np.zeros((len(m), 1), np.float32)], axis=1
        ).astype(np.float32)
        return Results(self._img, "", {0: "object"}, boxes=data, masks=m)


def _batched_mask_to_box(masks: np.ndarray) -> np.ndarray:
    """(N, H, W) bool -> (N, 4) xyxy (reference amg.py batched_mask_to_box)."""
    N = len(masks)
    out = np.zeros((N, 4), np.float32)
    for i in range(N):
        ys, xs = np.nonzero(masks[i])
        if len(ys):
            out[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
    return out


def _box_iou(a: np.ndarray, b: np.ndarray) -> float:
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0
