"""Streaming predictor (maps reference engine/predictor.py BasePredictor).

Source handling (image paths, dirs, globs, numpy arrays, video files, lists)
-> letterbox -> batched jitted forward+decode+NMS -> boxes scaled back to
original frames -> Results stream. The compiled graph is cached per
(batch, imgsz) so video streaming hits a single XLA program per shape.
"""

from __future__ import annotations

import glob
import time
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from bsyolo_tpu.engine.results import Results
from bsyolo_tpu.nn.heads import decode_detections
from bsyolo_tpu.ops.letterbox import letterbox_image
from bsyolo_tpu.ops.nms import non_max_suppression
from bsyolo_tpu.ops.boxes import scale_boxes
from bsyolo_tpu.utils import LOGGER

IMG_SUFFIXES = {".bmp", ".jpeg", ".jpg", ".png", ".tif", ".tiff", ".webp"}
VID_SUFFIXES = {".mp4", ".avi", ".mov", ".mkv", ".m4v", ".mpg", ".mpeg", ".wmv", ".webm"}


def iter_source(source, vid_stride: int = 1) -> Iterator[tuple]:
    """Yield (frame BGR ndarray, path, is_video_frame)."""
    import cv2

    if isinstance(source, np.ndarray):
        yield source, "array", False
        return
    if isinstance(source, (list, tuple)):
        for s in source:
            yield from iter_source(s, vid_stride)
        return
    p = Path(str(source))
    if p.is_dir():
        for f in sorted(p.rglob("*")):
            if f.suffix.lower() in IMG_SUFFIXES:
                im = cv2.imread(str(f))
                if im is not None:
                    yield im, str(f), False
        return
    if "*" in str(source):
        for f in sorted(glob.glob(str(source), recursive=True)):
            im = cv2.imread(f)
            if im is not None:
                yield im, f, False
        return
    if p.suffix.lower() in VID_SUFFIXES or str(source).startswith(("rtsp://", "http://", "https://")):
        cap = cv2.VideoCapture(str(source))
        n = 0
        try:
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                if n % vid_stride == 0:
                    yield frame, f"{source}#frame{n}", True
                n += 1
        finally:
            cap.release()
        return
    im = cv2.imread(str(source))
    if im is None:
        raise FileNotFoundError(f"cannot read source: {source}")
    yield im, str(source), False


class DetectionPredictor:
    def __init__(
        self,
        model,
        spec,
        variables,
        conf: float = 0.25,
        iou: float = 0.7,
        max_det: int = 300,
        imgsz: int = 640,
        classes: Optional[List[int]] = None,
        agnostic_nms: bool = False,
        names: Optional[Dict[int, str]] = None,
    ):
        self.model = model
        self.spec = spec
        self.variables = variables
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self.imgsz = imgsz
        self.classes = classes
        self.names = names or {i: n for i, n in enumerate(spec.names)}
        self.task = spec.task
        nc = spec.nc
        strides = spec.head_strides

        if spec.task == "classify":

            def forward(variables, x):
                logits = model.apply(variables, x, train=False)
                return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        elif spec.task == "segment":
            from bsyolo_tpu.nn.heads import decode_extras
            from bsyolo_tpu.ops.masks import process_mask

            def forward(variables, x):
                out = model.apply(variables, x, train=False)
                feats, proto = out["feats"], out["proto"]
                preds = decode_detections(feats, strides, nc)
                dets, idx = non_max_suppression(
                    preds, conf_thres=conf, iou_thres=iou, max_det=max_det, nc=nc,
                    agnostic=agnostic_nms, return_idx=True,
                )
                mc = decode_extras(feats, nc)  # (B, A, nm)
                coeffs = jnp.take_along_axis(mc, jnp.maximum(idx, 0)[..., None], axis=1)
                img_hw = (x.shape[1], x.shape[2])
                masks = jax.vmap(lambda p, c, b: process_mask(p, c, b, img_hw))(
                    proto, coeffs, dets[..., :4]
                )
                masks = masks * (idx >= 0)[..., None, None]
                return dets, masks

        elif spec.task == "pose":
            from bsyolo_tpu.nn.heads import decode_extras, decode_keypoints

            kpt_shape = spec.kpt_shape

            def forward(variables, x):
                feats = model.apply(variables, x, train=False)
                preds = decode_detections(feats, strides, nc)
                dets, idx = non_max_suppression(
                    preds, conf_thres=conf, iou_thres=iou, max_det=max_det, nc=nc,
                    agnostic=agnostic_nms, return_idx=True,
                )
                kflat = decode_extras(feats, nc)  # (B, A, nk) raw
                kpts = decode_keypoints(kflat, feats, strides, kpt_shape)  # (B, A, nkpt, d)
                sel = jnp.take_along_axis(
                    kpts, jnp.maximum(idx, 0)[..., None, None], axis=1
                ) * (idx >= 0)[..., None, None]
                return dets, sel

        elif spec.task == "obb":
            from bsyolo_tpu.nn.heads import decode_obb
            from bsyolo_tpu.ops.obb import nms_rotated

            def forward(variables, x):
                preds = decode_obb(model.apply(variables, x, train=False), strides, nc)
                return nms_rotated(
                    preds, conf_thres=conf, iou_thres=iou, max_det=max_det, nc=nc
                )

        else:  # detect

            def forward(variables, x):
                feats = model.apply(variables, x, train=False)
                preds = decode_detections(feats, strides, nc)
                return non_max_suppression(
                    preds,
                    conf_thres=conf,
                    iou_thres=iou,
                    max_det=max_det,
                    nc=nc,
                    agnostic=agnostic_nms,
                )

        self._forward = jax.jit(forward)

    def stream(self, source, vid_stride: int = 1, verbose: bool = False) -> Iterator[Results]:
        """Per-frame streaming inference (reference stream_inference:220)."""
        for frame, path, _ in iter_source(source, vid_stride):
            t0 = time.perf_counter()
            lb, r, (dw, dh) = letterbox_image(frame, (self.imgsz, self.imgsz))
            x = jnp.asarray(lb[None, ..., ::-1].astype(np.float32) / 255.0)
            t1 = time.perf_counter()
            if self.task == "classify":
                probs = np.asarray(self._forward(self.variables, x))[0]
                t2 = time.perf_counter()
                res = Results(frame, path, self.names, probs=probs)
                res.speed = {
                    "preprocess": (t1 - t0) * 1000,
                    "inference": (t2 - t1) * 1000,
                    "postprocess": 0.0,
                }
                yield res
                continue
            if self.task == "pose":
                dets_d, kpts_d = self._forward(self.variables, x)
                dets = np.asarray(dets_d)[0]
                kpts = np.asarray(kpts_d)[0]
                t2 = time.perf_counter()
                keep = dets[:, 4] > 0
                d, k = dets[keep], kpts[keep]
                h0, w0 = frame.shape[:2]
                gain = min(self.imgsz / h0, self.imgsz / w0)
                pw = round((self.imgsz - w0 * gain) / 2 - 0.1)
                ph = round((self.imgsz - h0 * gain) / 2 - 0.1)
                if len(d):
                    boxes = np.asarray(
                        scale_boxes((self.imgsz, self.imgsz), jnp.asarray(d[:, :4]), frame.shape[:2])
                    )
                    d = np.concatenate([boxes, d[:, 4:6]], -1)
                    k = k.copy()
                    k[..., 0] = (k[..., 0] - pw) / gain
                    k[..., 1] = (k[..., 1] - ph) / gain
                else:
                    d = np.zeros((0, 6), np.float32)
                    k = np.zeros((0,) + kpts.shape[1:], np.float32)
                res = Results(frame, path, self.names, boxes=d, keypoints=k)
                res.speed = {"preprocess": (t1 - t0) * 1000, "inference": (t2 - t1) * 1000,
                             "postprocess": (time.perf_counter() - t2) * 1000}
                yield res
                continue
            if self.task == "obb":
                dets = np.asarray(self._forward(self.variables, x))[0]
                t2 = time.perf_counter()
                d = dets[dets[:, 4] > 0]
                h0, w0 = frame.shape[:2]
                gain = min(self.imgsz / h0, self.imgsz / w0)
                pw = round((self.imgsz - w0 * gain) / 2 - 0.1)
                ph = round((self.imgsz - h0 * gain) / 2 - 0.1)
                if len(d):
                    d = d.copy()
                    d[:, 0] = (d[:, 0] - pw) / gain
                    d[:, 1] = (d[:, 1] - ph) / gain
                    d[:, 2:4] /= gain
                res = Results(frame, path, self.names, obb=d)
                res.speed = {"preprocess": (t1 - t0) * 1000, "inference": (t2 - t1) * 1000,
                             "postprocess": (time.perf_counter() - t2) * 1000}
                yield res
                continue
            if self.task == "segment":
                dets_d, masks_d = self._forward(self.variables, x)
                dets = np.asarray(dets_d)[0]
                masks = np.asarray(masks_d)[0]
                t2 = time.perf_counter()
                res = self._to_results(dets, frame, path, masks=masks)
                res.speed = {
                    "preprocess": (t1 - t0) * 1000,
                    "inference": (t2 - t1) * 1000,
                    "postprocess": (time.perf_counter() - t2) * 1000,
                }
                if verbose:
                    LOGGER.info(f"{path}: {res.verbose_line}")
                yield res
                continue
            dets = np.asarray(self._forward(self.variables, x))[0]
            t2 = time.perf_counter()
            res = self._to_results(dets, frame, path)
            res.speed = {
                "preprocess": (t1 - t0) * 1000,
                "inference": (t2 - t1) * 1000,
                "postprocess": (time.perf_counter() - t2) * 1000,
            }
            if verbose:
                LOGGER.info(f"{path}: {res.verbose_line} ({res.speed['inference']:.1f} ms)")
            yield res

    def _to_results(
        self, dets: np.ndarray, frame: np.ndarray, path: str, masks: Optional[np.ndarray] = None
    ) -> Results:
        keep = dets[:, 4] > 0
        d = dets[keep]
        if masks is not None:
            masks = masks[keep]
        if self.classes is not None and len(d):
            sel = np.isin(d[:, 5].astype(int), self.classes)
            d = d[sel]
            if masks is not None:
                masks = masks[sel]
        out_masks = None
        if len(d):
            boxes = np.asarray(
                scale_boxes((self.imgsz, self.imgsz), jnp.asarray(d[:, :4]), frame.shape[:2])
            )
            d = np.concatenate([boxes, d[:, 4:6]], -1)
            if masks is not None and len(masks):
                # undo the letterbox: crop the padded region then resize
                import cv2

                h0, w0 = frame.shape[:2]
                gain = min(self.imgsz / h0, self.imgsz / w0)
                ph = round((self.imgsz - h0 * gain) / 2 - 0.1)
                pw = round((self.imgsz - w0 * gain) / 2 - 0.1)
                hs, ws = int(round(h0 * gain)), int(round(w0 * gain))
                cropped = masks[:, ph : ph + hs, pw : pw + ws]
                out_masks = np.stack(
                    [cv2.resize(m, (w0, h0), interpolation=cv2.INTER_LINEAR) for m in cropped]
                )
                out_masks = (out_masks > 0.5).astype(np.float32)
        else:
            d = np.zeros((0, 6), np.float32)
        return Results(frame, path, self.names, boxes=d, masks=out_masks)

    def __call__(self, source, **kwargs) -> List[Results]:
        return list(self.stream(source, **kwargs))
