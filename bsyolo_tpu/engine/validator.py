"""Detection validator (maps reference engine/validator.py + models/yolo/detect/val.py).

Eval loop: jitted forward+decode+NMS on device, ragged metric accumulation on
host (match at 10 IoU thresholds -> ap_per_class). NMS runs at the reference
val settings conf=0.001 / iou=0.7 (detect/val.py:92).
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bsyolo_tpu.nn.heads import decode_detections
from bsyolo_tpu.ops.nms import non_max_suppression
from bsyolo_tpu.ops.boxes import xywh2xyxy
from bsyolo_tpu.utils.metrics import ConfusionMatrix, DetMetrics, _box_iou_np, match_predictions


class DetectionValidator:
    def __init__(
        self,
        model,
        spec,
        conf: float = 0.001,
        iou: float = 0.7,
        max_det: int = 300,
        pre_k: int = 1024,
        names: Optional[Dict[int, str]] = None,
    ):
        self.model = model
        self.spec = spec
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self.pre_k = pre_k
        self.names = names or {i: n for i, n in enumerate(spec.names)}
        self.iouv = np.linspace(0.5, 0.95, 10)

        nc = spec.nc
        strides = spec.head_strides

        def forward(variables, img):
            out = model.apply(variables, img, train=False)
            feats = out["feats"] if isinstance(out, dict) else out
            preds = decode_detections(feats, strides, nc)
            return non_max_suppression(
                preds, conf_thres=conf, iou_thres=iou, max_det=max_det, pre_k=pre_k, nc=nc
            )

        self._forward = jax.jit(forward)

    def __call__(self, variables, loader, verbose: bool = True) -> DetMetrics:
        stats = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
        confusion = ConfusionMatrix(nc=self.spec.nc, conf=self.conf)
        t_infer = 0.0
        n_img = 0
        for batch in loader:
            img = jnp.asarray(batch["img"])
            t0 = time.perf_counter()
            dets = np.asarray(self._forward(variables, img))  # (B, max_det, 6)
            t_infer += time.perf_counter() - t0
            b, h, w = img.shape[0], img.shape[1], img.shape[2]
            n_img += b
            scale = np.array([w, h, w, h], np.float32)
            for i in range(b):
                mask = batch["mask"][i] > 0
                gt_cls = np.asarray(batch["cls"][i])[mask].astype(np.float32)
                gt_xyxy = np.asarray(xywh2xyxy(jnp.asarray(batch["bboxes"][i][mask]))) * scale
                d = dets[i]
                d = d[d[:, 4] > 0]
                if len(d) == 0:
                    if len(gt_cls):
                        stats["tp"].append(np.zeros((0, len(self.iouv)), bool))
                        stats["conf"].append(np.zeros(0))
                        stats["pred_cls"].append(np.zeros(0))
                        stats["target_cls"].append(gt_cls)
                        confusion.process_batch(None, gt_xyxy, gt_cls)
                    continue
                iou = _box_iou_np(gt_xyxy, d[:, :4])
                tp = match_predictions(d[:, 5], gt_cls, iou, self.iouv)
                stats["tp"].append(tp)
                stats["conf"].append(d[:, 4])
                stats["pred_cls"].append(d[:, 5])
                stats["target_cls"].append(gt_cls)
                confusion.process_batch(d, gt_xyxy, gt_cls)

        metrics = DetMetrics(names=self.names)
        if stats["tp"]:
            tp = np.concatenate(stats["tp"]) if stats["tp"] else np.zeros((0, 10), bool)
            conf = np.concatenate(stats["conf"])
            pred_cls = np.concatenate(stats["pred_cls"])
            target_cls = np.concatenate(stats["target_cls"])
            if len(target_cls):
                metrics.process(tp, conf, pred_cls, target_cls)
        metrics.speed["inference"] = t_infer / max(n_img, 1) * 1000
        metrics.confusion_matrix = confusion
        return metrics
