"""Tile-parallel (SAHI-style) large-image inference.

Reference analog: detect-sahi.py (800x800 slices via the external `sahi`
package, host-side loop). TPU-native redesign (SURVEY.md §5.7): the tile axis
IS a mesh axis — tiles are letterboxed into one (T, ts, ts, 3) batch, sharded
across devices, detected in a single SPMD program, then fused by a global
cross-tile NMS on device. This is the sequence-parallel machinery the
reference lacks: spatial parallelism over ICI instead of a serial slice loop.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bsyolo_tpu.nn.heads import decode_detections
from bsyolo_tpu.ops.boxes import xyxy2xywh
from bsyolo_tpu.ops.nms import _greedy_keep, non_max_suppression
from bsyolo_tpu.ops.boxes import box_iou_pairwise


def tile_grid(img_h: int, img_w: int, tile: int, overlap: float = 0.2) -> List[Tuple[int, int]]:
    """Top-left corners of a covering tile grid (static for a given size)."""
    stride = max(1, int(tile * (1 - overlap)))

    def starts(size):
        if size <= tile:
            return [0]
        s = list(range(0, size - tile, stride))
        s.append(size - tile)
        return s

    return [(y, x) for y in starts(img_h) for x in starts(img_w)]


def make_tiled_predictor(
    model,
    spec,
    tile: int = 640,
    conf: float = 0.25,
    iou: float = 0.7,
    max_det: int = 300,
    max_det_per_tile: int = 100,
):
    """Build a jitted (variables, tiles, offsets) -> (max_det, 6) function."""
    nc = spec.nc
    strides = spec.head_strides

    @jax.jit
    def run(variables, tiles, offsets):
        feats = model.apply(variables, tiles, train=False)
        preds = decode_detections(
            feats, strides, nc, reg_max=getattr(spec, "reg_max", 16)
        )  # (T, A, 4+nc)
        dets = non_max_suppression(
            preds, conf_thres=conf, iou_thres=iou, max_det=max_det_per_tile, nc=nc
        )  # (T, K, 6)
        # shift tile-local boxes into global coords
        shift = jnp.concatenate([offsets[:, ::-1], offsets[:, ::-1]], axis=-1)  # (T, 4) x,y,x,y
        boxes = dets[..., :4] + shift[:, None, :] * (dets[..., 4:5] > 0)
        flat = jnp.concatenate([boxes, dets[..., 4:6]], -1).reshape(-1, 6)  # (T*K, 6)
        # global cross-tile fusion: greedy NMS over all surviving candidates
        order = jnp.argsort(-flat[:, 4])
        flat = flat[order]
        valid = flat[:, 4] > 0
        offset_cls = flat[:, 5:6] * 7680.0
        iou_mat = box_iou_pairwise(flat[:, :4] + offset_cls, flat[:, :4] + offset_cls)
        keep = _greedy_keep(iou_mat, valid, iou)
        scores = jnp.where(keep, flat[:, 4], -1.0)
        top, idx = jax.lax.top_k(scores, min(max_det, flat.shape[0]))
        out = flat[idx]
        return jnp.where((top > 0)[:, None], out, jnp.zeros_like(out).at[:, 5].set(-1.0))

    return run


def predict_tiled(
    model,
    spec,
    variables,
    image: np.ndarray,  # (H, W, 3) BGR uint8
    tile: int = 640,
    overlap: float = 0.2,
    conf: float = 0.25,
    iou: float = 0.7,
    max_det: int = 300,
    mesh=None,
    _cache={},
):
    """Tiled detection on one large image. Returns (n, 6) detections in
    original pixel coords (x1, y1, x2, y2, conf, cls)."""
    from bsyolo_tpu.parallel import batch_sharding

    h, w = image.shape[:2]
    grid = tile_grid(h, w, tile, overlap)
    T = len(grid)
    tiles = np.full((T, tile, tile, 3), 114, np.uint8)
    for i, (y, x) in enumerate(grid):
        patch = image[y : min(y + tile, h), x : min(x + tile, w)]
        tiles[i, : patch.shape[0], : patch.shape[1]] = patch
    tiles_f = tiles[..., ::-1].astype(np.float32) / 255.0
    offsets = np.asarray(grid, np.float32)  # (T, 2) as (y, x)

    key = (id(model), tile, conf, iou, max_det)
    if key not in _cache:
        _cache[key] = make_tiled_predictor(model, spec, tile, conf, iou, max_det)
    run = _cache[key]

    tiles_j = jnp.asarray(tiles_f)
    offs_j = jnp.asarray(offsets)
    if mesh is not None and T % mesh.devices.size == 0:
        sh = batch_sharding(mesh)
        tiles_j = jax.device_put(tiles_j, sh)
        offs_j = jax.device_put(offs_j, sh)
    out = np.asarray(run(variables, tiles_j, offs_j))
    return out[out[:, 4] > 0]
