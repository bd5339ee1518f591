"""YOLO-NAS support (reference models/nas/{model.py,predict.py,val.py}).

YOLO-NAS checkpoints are full pickled super-gradients torch modules
(reference NAS._load imports super_gradients); the architecture has no YAML
graph, so it cannot be rebuilt offline. What IS portable — and what this
module provides — is the NAS inference contract: the model emits
pre-decoded ``(boxes_xyxy, class_scores)`` pairs, and pre/post-processing
is the standard pipeline with NMS over the already-decoded boxes
(reference predict.py:35 NASPredictor.postprocess).

``postprocess_nas`` runs that contract on-device with static shapes, so any
converted NAS-style backbone (or an ONNX-roundtripped one) drops into the
existing predictor/validator machinery.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def postprocess_nas(
    boxes_xyxy: jax.Array,  # (B, N, 4) decoded boxes, input pixels
    class_scores: jax.Array,  # (B, N, nc) probabilities
    conf_thres: float = 0.25,
    iou_thres: float = 0.7,
    max_det: int = 300,
) -> jax.Array:
    """NAS raw outputs -> (B, max_det, 6) xyxy/conf/cls, zero-padded — the
    repo-wide NMS output convention (reference NASPredictor.postprocess:
    cat(xyxy2xywh(boxes), scores) -> non_max_suppression)."""
    from bsyolo_tpu.ops.boxes import xyxy2xywh
    from bsyolo_tpu.ops.nms import non_max_suppression

    preds = jnp.concatenate(
        [xyxy2xywh(boxes_xyxy.astype(jnp.float32)), class_scores.astype(jnp.float32)], axis=-1
    )
    return non_max_suppression(preds, conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det)


class NAS:
    """YOLO-NAS facade (reference models/nas/model.py:25).

    Only pre-trained models exist for NAS (no YAML), and its super-gradients
    graph cannot be reconstructed in this offline environment — attempting to
    load one explains exactly that. The postprocess contract is available as
    :func:`postprocess_nas` for converted/exported NAS backbones.
    """

    def __init__(self, model: str = "yolo_nas_s.pt"):
        from pathlib import Path

        assert Path(model).suffix not in {".yaml", ".yml"}, (
            "YOLO-NAS models only support pre-trained models."
        )
        raise NotImplementedError(
            "YOLO-NAS checkpoints are pickled super-gradients torch modules with no "
            "YAML graph; rebuilding them needs the super-gradients package, which is "
            "not available offline. Export the NAS model to StableHLO/ONNX and use "
            "bsyolo_tpu.models.nas.postprocess_nas for the decode+NMS stage."
        )
