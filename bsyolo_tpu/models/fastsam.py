"""FastSAM: segment-anything via a YOLOv8-seg graph + prompt selection
(reference models/fastsam/{model.py,predict.py,utils.py}).

The model is the plain yolov8-seg graph with nc=1 ("everything" is one
class); prompting is pure post-processing — select the predicted masks that
best match box/point prompts (reference FastSAMPredictor.prompt) — so the
TPU compute path is exactly the existing segment predictor.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from bsyolo_tpu.model import YOLO


def adjust_bboxes_to_image_border(boxes: np.ndarray, shape, threshold: int = 20) -> np.ndarray:
    """Snap near-border box edges to the image border
    (reference models/fastsam/utils.py:4)."""
    h, w = shape
    b = boxes.copy()
    b[:, 0] = np.where(b[:, 0] < threshold, 0, b[:, 0])
    b[:, 1] = np.where(b[:, 1] < threshold, 0, b[:, 1])
    b[:, 2] = np.where(b[:, 2] > w - threshold, w, b[:, 2])
    b[:, 3] = np.where(b[:, 3] > h - threshold, h, b[:, 3])
    return b


class FastSAM(YOLO):
    """FastSAM facade (reference models/fastsam/model.py:10).

        m = FastSAM("FastSAM-s.yaml")          # yolov8s-seg graph, nc=1
        r = m("img.jpg", bboxes=[[100, 100, 300, 300]])
        r = m("img.jpg", points=[[200, 200]], labels=[1])
    """

    def __init__(self, model: str = "FastSAM-s.yaml", task: Optional[str] = None):
        name = str(model)
        scale = "s"
        low = name.lower()
        for s in "nsmlx":
            if low.startswith(f"fastsam-{s}"):
                scale = s
        # build ONCE with nc=1 (reference FastSAM checkpoints are 1-class);
        # skip YOLO.__init__'s nc=80 build entirely
        from bsyolo_tpu.cfg import model_yaml_path
        from bsyolo_tpu.nn import build_model, load_model_yaml, parse_model_yaml

        self.model_path = name
        self.task = task or "segment"
        self.overrides = {"names": {0: "object"}}
        self.metrics = None
        self._predictor = None
        self._img_size = 640
        d = load_model_yaml(model_yaml_path(f"yolov8{scale}-seg.yaml"))
        d["nc"] = 1
        self.spec = parse_model_yaml(d, scale=scale)
        self.model, self.variables = build_model(self.spec, img_size=self._img_size)

    def predict(self, source, stream: bool = False, bboxes=None, points=None,
                labels=None, texts=None, **kwargs):
        kwargs.setdefault("conf", 0.4)
        results = super().predict(source, stream=stream, **kwargs)
        if texts is not None:
            raise NotImplementedError(
                "text prompts need a CLIP encoder, unavailable in this offline build; "
                "use bboxes=/points= prompts"
            )
        if bboxes is None and points is None:
            return results
        return [self._prompt(r, bboxes, points, labels) for r in results]

    @staticmethod
    def _prompt(result, bboxes=None, points=None, labels=None):
        """Select masks matching the prompts (reference predict.py:46)."""
        if result.masks is None or len(result.masks.data) == 0:
            return result
        masks = result.masks.data.astype(bool)  # (N, H, W) in original pixels
        n = len(masks)
        idx = np.zeros(n, bool)
        if bboxes is not None:
            bb = np.asarray(bboxes, np.int32).reshape(-1, 4)
            full_areas = masks.sum((1, 2)).astype(np.float64)
            for b in bb:
                x1, y1, x2, y2 = b
                inter = masks[:, y1:y2, x1:x2].sum((1, 2)).astype(np.float64)
                bbox_area = float((y2 - y1) * (x2 - x1))
                union = bbox_area + full_areas - inter
                iou = np.where(union > 0, inter / union, 0.0)
                idx[int(np.argmax(iou))] = True
        if points is not None:
            pts = np.asarray(points, np.int32).reshape(-1, 2)
            lab = np.ones(len(pts), np.int32) if labels is None else np.asarray(labels, np.int32)
            pidx = np.zeros(n, bool) if lab.sum() else np.ones(n, bool)
            for p, l in zip(pts, lab):
                hits = masks[:, p[1], p[0]]
                pidx[hits] = bool(l)
            idx |= pidx
        keep = np.flatnonzero(idx)
        from bsyolo_tpu.engine.results import Results

        return Results(
            result.orig_img, result.path, result.names,
            boxes=result.boxes.data[keep] if result.boxes is not None else None,
            masks=masks[keep].astype(np.float32),
        )
