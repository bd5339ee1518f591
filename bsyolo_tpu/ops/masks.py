"""Mask ops for instance segmentation (reference utils/ops.py:644-760)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def crop_mask(masks: Array, boxes: Array) -> Array:
    """Zero mask pixels outside each xyxy box (reference ops.py:644).

    masks: (n, H, W); boxes: (n, 4) in mask pixel coords.
    """
    n, h, w = masks.shape
    x1, y1, x2, y2 = jnp.split(boxes[:, :, None], 4, axis=1)  # each (n, 1, 1)
    c = jnp.arange(w, dtype=boxes.dtype)[None, None, :]
    r = jnp.arange(h, dtype=boxes.dtype)[None, :, None]
    keep = (c >= x1) & (c < x2) & (r >= y1) & (r < y2)
    return masks * keep


def process_mask(
    proto: Array,  # (Hm, Wm, nm)
    coeffs: Array,  # (n, nm)
    boxes_xyxy: Array,  # (n, 4) in network-input pixels
    img_hw: Tuple[int, int],
    upsample: bool = True,
) -> Array:
    """Combine prototypes with per-detection coefficients (reference ops.py:663).

    Returns (n, H, W) float masks in [0, 1] at img_hw resolution.
    """
    hm, wm, nm = proto.shape
    masks = jax.nn.sigmoid(
        jnp.einsum("hwc,nc->nhw", proto.astype(jnp.float32), coeffs.astype(jnp.float32))
    )
    ih, iw = img_hw
    scale = jnp.asarray([wm / iw, hm / ih, wm / iw, hm / ih], jnp.float32)
    masks = crop_mask(masks, boxes_xyxy * scale)
    if upsample:
        masks = jax.image.resize(masks, (masks.shape[0], ih, iw), method="bilinear")
    return masks


def scale_masks(masks: Array, target_hw: Tuple[int, int]) -> Array:
    """Resize (n, H, W) masks (reference ops.py:716)."""
    n = masks.shape[0]
    return jax.image.resize(masks, (n, target_hw[0], target_hw[1]), method="bilinear")
