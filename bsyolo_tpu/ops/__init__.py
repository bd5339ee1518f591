"""Pure-JAX geometry / box ops substrate (maps reference utils/{ops,tal,metrics}.py)."""

from bsyolo_tpu.ops.boxes import (
    bbox_iou,
    box_iou_pairwise,
    clip_boxes,
    inner_iou,
    scale_boxes,
    wasserstein_loss,
    xywh2xyxy,
    xyxy2xywh,
)
from bsyolo_tpu.ops.anchors import bbox2dist, dist2bbox, make_anchors
from bsyolo_tpu.ops.nms import non_max_suppression
from bsyolo_tpu.ops.letterbox import letterbox_params, letterbox_image
from bsyolo_tpu.ops.normalize import normalize_image_batch

__all__ = [
    "normalize_image_batch",
    "bbox_iou",
    "box_iou_pairwise",
    "clip_boxes",
    "inner_iou",
    "scale_boxes",
    "wasserstein_loss",
    "xywh2xyxy",
    "xyxy2xywh",
    "bbox2dist",
    "dist2bbox",
    "make_anchors",
    "non_max_suppression",
    "letterbox_params",
    "letterbox_image",
]
