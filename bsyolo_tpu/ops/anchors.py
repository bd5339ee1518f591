"""Anchor-free grid utilities (reference: ultralytics/utils/tal.py:371-410).

TPU-first: anchors are built from *static* feature shapes at trace time so the
whole decode path stays shape-stable under jit.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def make_anchors(
    feat_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    grid_cell_offset: float = 0.5,
    dtype=jnp.float32,
) -> Tuple[Array, Array]:
    """Build concatenated anchor centers and per-anchor strides.

    Args:
        feat_shapes: [(h, w), ...] per detection level (static Python ints).
        strides: per-level stride.

    Returns:
        anchor_points: (sum(h*w), 2) grid-cell centers in feature units.
        stride_tensor: (sum(h*w), 1).
    """
    anchor_points, stride_tensor = [], []
    for (h, w), stride in zip(feat_shapes, strides):
        sx = jnp.arange(w, dtype=dtype) + grid_cell_offset
        sy = jnp.arange(h, dtype=dtype) + grid_cell_offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        anchor_points.append(jnp.stack((gx, gy), -1).reshape(-1, 2))
        stride_tensor.append(jnp.full((h * w, 1), stride, dtype=dtype))
    return jnp.concatenate(anchor_points), jnp.concatenate(stride_tensor)


def dist2bbox(distance: Array, anchor_points: Array, xywh: bool = True, axis: int = -1) -> Array:
    """Transform distance (l, t, r, b) to box (xywh or xyxy) (reference tal.py:386)."""
    lt, rb = jnp.split(distance, 2, axis=axis)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c_xy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate((c_xy, wh), axis=axis)
    return jnp.concatenate((x1y1, x2y2), axis=axis)


def bbox2dist(anchor_points: Array, bbox: Array, reg_max: float) -> Array:
    """Transform xyxy box to clamped (l, t, r, b) distances (reference tal.py:398)."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    return jnp.clip(
        jnp.concatenate((anchor_points - x1y1, x2y2 - anchor_points), axis=-1),
        0,
        reg_max - 0.01,
    )


def dist2rbox(pred_dist: Array, pred_angle: Array, anchor_points: Array, axis: int = -1) -> Array:
    """Decode rotated boxes from distances + angle (reference tal.py:404-423)."""
    lt, rb = jnp.split(pred_dist, 2, axis=axis)
    cos, sin = jnp.cos(pred_angle), jnp.sin(pred_angle)
    xf, yf = jnp.split((rb - lt) / 2, 2, axis=axis)
    x, y = xf * cos - yf * sin, xf * sin + yf * cos
    xy = jnp.concatenate([x, y], axis=axis) + anchor_points
    return jnp.concatenate([xy, lt + rb], axis=axis)
