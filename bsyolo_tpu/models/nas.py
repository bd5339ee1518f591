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


def NAS(model: str = "yolo_nas_s.pt"):
    """YOLO-NAS facade (reference models/nas/model.py:25).

    The reference loads a pickled super-gradients torch module over the
    network; that artifact cannot be imported offline. Instead the graph
    itself is RECONSTRUCTED from the public architecture description
    (cfg/models/nas/yolo_nas_{s,m,l}.yaml + nn/modules_nas.py), so
    ``NAS("yolo_nas_s")`` builds a runnable, trainable model through the
    standard detect machinery — with random init (no offline pretrained
    weights; a ``.pt`` argument explains that). Its NDFL head flows through
    the shared decode/NMS path (ModelSpec.reg_max = 17 bins), which
    supersedes the standalone :func:`postprocess_nas` contract below.
    """
    from pathlib import Path

    p = Path(model)
    if p.suffix == ".pt":
        raise NotImplementedError(
            "YOLO-NAS .pt checkpoints are pickled super-gradients torch modules; "
            "they cannot be unpickled offline. Build the reconstructed graph with "
            "NAS('yolo_nas_s') (random init) or export the torch model to "
            "StableHLO/ONNX and run it through AutoBackend."
        )
    from bsyolo_tpu.model import YOLO

    if p.suffix and p.exists():
        return YOLO(str(p))  # user-supplied YAML path outside the bundled zoo
    name = p.name if p.suffix else p.name + ".yaml"
    return YOLO(name)
