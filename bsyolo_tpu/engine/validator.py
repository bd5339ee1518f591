"""Detection validator (maps reference engine/validator.py + models/yolo/detect/val.py).

Eval loop: jitted forward+decode+NMS on device, ragged metric accumulation on
host (match at 10 IoU thresholds -> ap_per_class). NMS runs at the reference
val settings conf=0.001 / iou=0.7 (detect/val.py:92).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bsyolo_tpu.kernels.postprocess import detect_postprocess
from bsyolo_tpu.nn.heads import decode_detections
from bsyolo_tpu.ops.nms import non_max_suppression
from bsyolo_tpu.ops.normalize import normalize_image_batch
from bsyolo_tpu.ops.boxes import xywh2xyxy
from bsyolo_tpu.utils.metrics import ConfusionMatrix, DetMetrics, _box_iou_np, match_predictions


class _JsonCollector:
    """Accumulates COCO-format prediction dicts during a val run and writes
    predictions.json (the plumbing around pred_to_json in the reference
    models/yolo/*/val.py). Maps letterboxed network coords back into
    original image pixels; requires a shuffle=False loader whose dataset
    exposes img_files (how val always runs)."""

    def __init__(self, loader, save_dir=None, class_map=None):
        self.jdict: list = []
        self.save_dir = save_dir
        self.class_map = class_map
        self.im_files = getattr(getattr(loader, "dataset", None), "img_files", None)
        self.n = len(self.im_files) if self.im_files else 0
        if not self.im_files:
            from bsyolo_tpu.utils import LOGGER

            LOGGER.warning(
                "save_json requested but the loader's dataset has no img_files; "
                "no predictions.json will be written"
            )

    def unletterbox(self, k: int, input_hw):
        """-> ((w0, h0), r, dw, dh) for image index k."""
        return _unletterbox_file(self.im_files[k], input_hw)

    def save(self):
        from pathlib import Path

        from bsyolo_tpu.utils import LOGGER
        from bsyolo_tpu.utils.coco import save_predictions_json

        out = Path(self.save_dir or ".") / "predictions.json"
        out.parent.mkdir(parents=True, exist_ok=True)
        save_predictions_json(self.jdict, out)
        LOGGER.info(f"saved {len(self.jdict)} COCO-format predictions to {out}")
        return out


def _unletterbox_file(im_file, input_hw):
    """((w0, h0), r, dw, dh) mapping network-input coords back to the
    original pixels of ``im_file`` (val letterboxes scaleup=False, centered)."""
    from PIL import Image

    from bsyolo_tpu.ops.letterbox import letterbox_params

    with Image.open(im_file) as im:
        w0, h0 = im.size
    r, (dw, dh), _ = letterbox_params((h0, w0), input_hw, scaleup=False)
    return (w0, h0), r, dw, dh


def _boxes_to_original(dets: np.ndarray, ub) -> np.ndarray:
    """Un-letterbox xyxy columns of (N, 6+) dets using ``ub`` from
    :func:`_unletterbox_file` (the one place this clip-and-scale lives)."""
    (w0, h0), r, dw, dh = ub
    d = dets.copy()
    d[:, [0, 2]] = np.clip((d[:, [0, 2]] - dw) / r, 0, w0)
    d[:, [1, 3]] = np.clip((d[:, [1, 3]] - dh) / r, 0, h0)
    return d


def _mask_to_original(mask: np.ndarray, input_hw, orig_wh, r: float, dw: float, dh: float) -> np.ndarray:
    """Proto-resolution binary mask -> original-image-size binary mask:
    nearest upsample to network input, crop the letterbox pad, nearest
    resize to (h0, w0) (the reference's ops.scale_image, RLE-grade)."""
    h, w = input_hw
    w0, h0 = orig_wh
    fh, fw = h // mask.shape[0], w // mask.shape[1]
    mi = np.repeat(np.repeat(mask, fh, axis=0), fw, axis=1)
    ch, cw = int(round(h0 * r)), int(round(w0 * r))
    top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
    crop = mi[top : top + ch, left : left + cw]
    if crop.size == 0:
        return np.zeros((h0, w0), bool)
    yi = np.clip((np.arange(h0) * crop.shape[0] / h0).astype(int), 0, crop.shape[0] - 1)
    xi = np.clip((np.arange(w0) * crop.shape[1] / w0).astype(int), 0, crop.shape[1] - 1)
    return crop[yi][:, xi].astype(bool)



def _pipeline_forward(forward, variables, loader):
    """One-batch software pipeline shared by all validators: dispatch batch
    k+1's forward (jax arrays are futures) before batch k's result is read,
    so the host's metric matching overlaps the device's next forward.

    BSYOLO_VAL_SYNC=1 degrades to a synchronous dispatch-read loop — kept
    for measuring the pipeline's win (examples/bench_val_pipeline.py)."""
    if os.environ.get("BSYOLO_VAL_SYNC"):
        for nxt in loader:
            pending = forward(variables, jnp.asarray(nxt["img"]))
            pending = jax.tree_util.tree_map(np.asarray, pending)  # block now
            yield nxt, pending
        return
    prev = None
    for nxt in loader:
        pending = forward(variables, jnp.asarray(nxt["img"]))
        if prev is not None:
            yield prev
        prev = (nxt, pending)
    if prev is not None:
        yield prev


def _collapse_single_cls(dets: np.ndarray) -> np.ndarray:
    """val single_cls: predictions collapse to class 0, padding rows keep
    their -1 sentinel (reference detect/val.py); one copy for 4 validators."""
    d = dets.copy()
    d[..., 5] = np.where(d[..., 5] >= 0, 0.0, d[..., 5])
    return d


def _filter_classes(dets: np.ndarray, classes) -> np.ndarray:
    """val(classes=[...]): zero out detections outside the class whitelist
    (reference NMS classes arg); padding convention (conf 0 / cls -1) kept."""
    if not classes:
        return dets
    d = dets.copy()
    keep = np.isin(d[..., 5].astype(int), np.asarray(list(classes), int))
    d[..., 4] = np.where(keep, d[..., 4], 0.0)
    d[..., 5] = np.where(keep, d[..., 5], -1.0)
    return d


class OBBValidator:
    """Rotated-box validation: probIoU matching at 10 thresholds
    (reference models/yolo/obb/val.py)."""

    def __init__(self, model, spec, conf: float = 0.001, iou: float = 0.7, max_det: int = 300,
                 names: Optional[Dict[int, str]] = None, save_dir=None, plots: bool = False,
                 single_cls: bool = False, classes=None, save_json: bool = False,
                 class_map=None):
        from bsyolo_tpu.nn.heads import decode_obb
        from bsyolo_tpu.ops.obb import nms_rotated

        self.conf = conf
        self.save_dir = save_dir
        self.plots = plots
        self.single_cls = single_cls
        self.classes = classes
        self.save_json = save_json
        self.class_map = class_map
        self.spec = spec
        self.names = names or {i: n for i, n in enumerate(spec.names)}
        self.iouv = np.linspace(0.5, 0.95, 10)
        nc, strides = spec.nc, spec.head_strides

        def forward(variables, img):
            img = normalize_image_batch(img)  # uint8 batches: cast on device
            preds = decode_obb(model.apply(variables, img, train=False), strides, nc)
            return nms_rotated(preds, conf_thres=conf, iou_thres=iou, max_det=max_det, nc=nc)

        self._forward = jax.jit(forward)

    def __call__(self, variables, loader, verbose: bool = True) -> DetMetrics:
        import jax.numpy as jnp2

        from bsyolo_tpu.ops.obb import batch_probiou

        stats = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
        confusion = ConfusionMatrix(nc=self.spec.nc, conf=self.conf)
        jc = _JsonCollector(loader, self.save_dir, self.class_map) if self.save_json else None
        n_seen = 0
        for batch, pending in _pipeline_forward(self._forward, variables, loader):
            img = batch["img"]
            dets = np.asarray(pending)  # (B, max_det, 7)
            if self.single_cls:
                # nms_rotated has no agnostic mode; the class-separated
                # suppression can keep marginally more boxes than the
                # reference's agnostic pass
                dets = _collapse_single_cls(dets)
            dets = _filter_classes(dets, self.classes)
            h, w = img.shape[1], img.shape[2]
            scale = np.asarray([w, h, w, h, 1.0], np.float32)
            im_idx = batch.get("im_idx")
            for i in range(img.shape[0]):
                ksn = n_seen
                n_seen += 1
                if im_idx is not None:
                    ksn = int(im_idx[i])
                    if ksn < 0:
                        continue  # wrap-padded duplicate row
                m = batch["mask"][i] > 0
                gt_cls = np.asarray(batch["cls"][i])[m].astype(np.float32)
                gt_rb = np.asarray(batch["rboxes"][i][m]) * scale
                d = dets[i]
                d = d[d[:, 4] > 0]
                if jc is not None and jc.im_files and ksn < jc.n and len(d):
                    from bsyolo_tpu.utils.coco import obb_pred_to_json

                    # un-letterbox the rotated boxes: center shifts by the
                    # pad, w/h scale by 1/r, the angle is invariant
                    (w0, h0), rr, dw, dh = jc.unletterbox(ksn, (h, w))
                    db = d.copy()
                    db[:, 0] = (db[:, 0] - dw) / rr
                    db[:, 1] = (db[:, 1] - dh) / rr
                    db[:, 2:4] /= rr
                    jc.jdict.extend(obb_pred_to_json(db, jc.im_files[ksn], class_map=jc.class_map))
                if len(d) == 0:
                    if len(gt_cls):
                        stats["tp"].append(np.zeros((0, 10), bool))
                        stats["conf"].append(np.zeros(0))
                        stats["pred_cls"].append(np.zeros(0))
                        stats["target_cls"].append(gt_cls)
                        confusion.process_batch(None, gt_rb, gt_cls)
                    continue
                pd_rb = np.concatenate([d[:, :4], d[:, 6:7]], -1)
                iou_m = np.asarray(batch_probiou(jnp2.asarray(gt_rb), jnp2.asarray(pd_rb)))
                # rotated confusion: probIoU columns for the conf-filtered
                # subset (reference obb/val.py confusion_matrix.process_batch)
                ck = d[:, 4] > confusion.conf
                confusion.process_batch(d[ck], gt_rb, gt_cls, iou=iou_m[:, ck])
                tp = match_predictions(d[:, 5], gt_cls, iou_m, self.iouv)
                stats["tp"].append(tp)
                stats["conf"].append(d[:, 4])
                stats["pred_cls"].append(d[:, 5])
                stats["target_cls"].append(gt_cls)
        if jc is not None and jc.im_files:
            jc.save()
        metrics = DetMetrics(names=self.names)
        if stats["tp"]:
            target_cls = np.concatenate(stats["target_cls"])
            if len(target_cls):
                metrics.process(
                    np.concatenate(stats["tp"]),
                    np.concatenate(stats["conf"]),
                    np.concatenate(stats["pred_cls"]),
                    target_cls,
                )
        metrics.confusion_matrix = confusion
        if self.plots and self.save_dir is not None:
            _finalize_val_plots(confusion, metrics, self.names, self.save_dir)
        return metrics


class SegmentMetrics(DetMetrics):
    """Box + mask mAP aggregation (reference metrics.py:982)."""

    def __init__(self, names=None):
        super().__init__(names)
        from bsyolo_tpu.utils.metrics import Metric

        self.seg = Metric()
        self.seg.nc = len(self.names)

    def process_seg(self, tp_m, conf, pred_cls, target_cls):
        from bsyolo_tpu.utils.metrics import ap_per_class

        self.seg.update(ap_per_class(tp_m, conf, pred_cls, target_cls))

    @property
    def fitness(self):
        return self.box.fitness() + self.seg.fitness()

    @property
    def results_dict(self):
        out = {
            "metrics/precision(B)": self.box.mp,
            "metrics/recall(B)": self.box.mr,
            "metrics/mAP50(B)": self.box.map50,
            "metrics/mAP50-95(B)": self.box.map,
            "metrics/mAP50(M)": self.seg.map50,
            "metrics/mAP50-95(M)": self.seg.map,
            "fitness": self.fitness,
        }
        return out



def _finalize_val_plots(confusion, metrics, names, save_dir):
    """plots=True artifacts shared by the detect-family validators:
    confusion_matrix.png + box PR/P/R/F1 curves (reference validator plots)."""
    from pathlib import Path as _Path

    from bsyolo_tpu.utils.plotting import (
        plot_confusion_matrix,
        plot_mc_curve,
        plot_pr_curve,
    )

    sd = _Path(save_dir)
    plot_confusion_matrix(confusion.matrix, names, str(sd / "confusion_matrix.png"))
    curves = getattr(metrics, "curves", None)
    if curves is not None and curves["prec_values"].size:
        # curve rows follow ap_per_class's unique-class order, NOT 0..k-1 —
        # remap row index -> actual class name (a val split containing only
        # classes {2, 7} must not be legended "class0/class1")
        cls_idx = np.asarray(metrics.box.ap_class_index).astype(int)
        row_names = {i: names.get(int(c), int(c)) for i, c in enumerate(cls_idx)}
        plot_pr_curve(curves["x"], curves["prec_values"], np.asarray(metrics.box.ap50),
                      row_names, str(sd / "PR_curve.png"))
        plot_mc_curve(curves["x"], curves["f1"], row_names, str(sd / "F1_curve.png"), ylabel="F1")
        plot_mc_curve(curves["x"], curves["p"], row_names, str(sd / "P_curve.png"), ylabel="Precision")
        plot_mc_curve(curves["x"], curves["r"], row_names, str(sd / "R_curve.png"), ylabel="Recall")


class SegmentationValidator:
    """Box + mask mAP (reference models/yolo/segment/val.py): mask true
    positives use flattened mask IoU against the overlap-encoded gt masks."""

    def __init__(self, model, spec, conf: float = 0.001, iou: float = 0.7, max_det: int = 300,
                 names: Optional[Dict[int, str]] = None, save_json: bool = False,
                 save_dir=None, class_map=None, plots: bool = False,
                 single_cls: bool = False, classes=None):
        from bsyolo_tpu.nn.heads import decode_extras
        from bsyolo_tpu.ops.masks import process_mask

        self.conf = conf
        self.plots = plots
        self.single_cls = single_cls
        self.classes = classes
        self.spec = spec
        self.names = names or {i: n for i, n in enumerate(spec.names)}
        self.iouv = np.linspace(0.5, 0.95, 10)
        self.save_json = save_json
        self.save_dir = save_dir
        self.class_map = class_map
        nc, strides = spec.nc, spec.head_strides

        def forward(variables, img):
            img = normalize_image_batch(img)  # uint8 batches: cast on device
            out = model.apply(variables, img, train=False)
            feats, proto = out["feats"], out["proto"]
            dets, idx = detect_postprocess(
                feats, strides, nc, conf_thres=conf, iou_thres=iou, max_det=max_det,
                return_idx=True, agnostic=single_cls,
            )
            mc = decode_extras(feats, nc)
            coeffs = jnp.take_along_axis(mc, jnp.maximum(idx, 0)[..., None], axis=1)
            hm, wm = proto.shape[1], proto.shape[2]
            # masks at proto resolution (upsample=False) for cheap IoU
            masks = jax.vmap(
                lambda p, c, b: process_mask(p, c, b, (img.shape[1], img.shape[2]), upsample=False)
            )(proto, coeffs, dets[..., :4])
            masks = (masks > 0.5) & (idx >= 0)[..., None, None]
            return dets, masks

        self._forward = jax.jit(forward)

    def __call__(self, variables, loader, verbose: bool = True) -> SegmentMetrics:
        from bsyolo_tpu.ops.boxes import xywh2xyxy as _xywh2xyxy

        stats = {k: [] for k in ("tp", "tp_m", "conf", "pred_cls", "target_cls")}
        confusion = ConfusionMatrix(nc=self.spec.nc, conf=self.conf)
        jc = _JsonCollector(loader, self.save_dir, self.class_map) if self.save_json else None
        n_seen = 0
        for batch, pending in _pipeline_forward(self._forward, variables, loader):
            img = batch["img"]
            dets, masks = np.asarray(pending[0]), np.asarray(pending[1])
            if self.single_cls:
                dets = _collapse_single_cls(dets)
            dets = _filter_classes(dets, self.classes)
            h, w = img.shape[1], img.shape[2]
            scale = np.asarray([w, h, w, h], np.float32)
            im_idx = batch.get("im_idx")
            for i in range(img.shape[0]):
                k = n_seen
                n_seen += 1
                if im_idx is not None:
                    k = int(im_idx[i])
                    if k < 0:
                        continue  # wrap-padded duplicate row
                m = batch["mask"][i] > 0
                gt_cls = np.asarray(batch["cls"][i])[m].astype(np.float32)
                gt_xyxy = np.asarray(_xywh2xyxy(jnp.asarray(batch["bboxes"][i][m]))) * scale
                gmask = np.asarray(batch["masks"][i])  # (hm, wm) overlap-encoded
                d = dets[i]
                keep = d[:, 4] > 0
                d, pm = d[keep], masks[i][keep]
                if jc is not None and jc.im_files and k < jc.n and len(d):
                    from bsyolo_tpu.utils.coco import seg_pred_to_json

                    ub = jc.unletterbox(k, (h, w))
                    (w0, h0), r, dw, dh = ub
                    db = _boxes_to_original(d, ub)
                    m0 = np.stack(
                        [_mask_to_original(mm, (h, w), (w0, h0), r, dw, dh) for mm in pm]
                    )
                    jc.jdict.extend(seg_pred_to_json(db, m0, jc.im_files[k], class_map=jc.class_map))
                if len(d) == 0:
                    if len(gt_cls):
                        for k in ("tp", "tp_m"):
                            stats[k].append(np.zeros((0, 10), bool))
                        stats["conf"].append(np.zeros(0))
                        stats["pred_cls"].append(np.zeros(0))
                        stats["target_cls"].append(gt_cls)
                        confusion.process_batch(None, gt_xyxy, gt_cls)
                    continue
                confusion.process_batch(d, gt_xyxy, gt_cls)
                iou_b = _box_iou_np(gt_xyxy, d[:, :4])
                tp = match_predictions(d[:, 5], gt_cls, iou_b, self.iouv)
                # mask IoU: gt instance g -> pixels == g+1 in the overlap mask
                n_gt = len(gt_cls)
                gms = np.stack([(gmask == g + 1) for g in range(n_gt)]) if n_gt else np.zeros(
                    (0,) + gmask.shape, bool
                )
                g_flat = gms.reshape(n_gt, -1).astype(np.float32)
                p_flat = pm.reshape(len(pm), -1).astype(np.float32)
                inter = g_flat @ p_flat.T  # (n_gt, n_pd)
                union = g_flat.sum(-1)[:, None] + p_flat.sum(-1)[None, :] - inter
                iou_m = inter / (union + 1e-7)
                tp_m = match_predictions(d[:, 5], gt_cls, iou_m, self.iouv)
                stats["tp"].append(tp)
                stats["tp_m"].append(tp_m)
                stats["conf"].append(d[:, 4])
                stats["pred_cls"].append(d[:, 5])
                stats["target_cls"].append(gt_cls)
        if jc is not None and jc.im_files:
            jc.save()
        metrics = SegmentMetrics(names=self.names)
        if stats["tp"]:
            target_cls = np.concatenate(stats["target_cls"])
            if len(target_cls):
                conf = np.concatenate(stats["conf"])
                pcls = np.concatenate(stats["pred_cls"])
                metrics.process(np.concatenate(stats["tp"]), conf, pcls, target_cls)
                metrics.process_seg(np.concatenate(stats["tp_m"]), conf, pcls, target_cls)
        metrics.confusion_matrix = confusion
        if self.plots and self.save_dir is not None:
            _finalize_val_plots(confusion, metrics, self.names, self.save_dir)
        return metrics


class PoseMetrics(DetMetrics):
    """Box + pose (OKS) AP aggregation (reference metrics.py:1122)."""

    def __init__(self, names=None):
        super().__init__(names)
        from bsyolo_tpu.utils.metrics import Metric

        self.pose = Metric()
        self.pose.nc = len(self.names)

    def process_pose(self, tp_p, conf, pred_cls, target_cls):
        from bsyolo_tpu.utils.metrics import ap_per_class

        self.pose.update(ap_per_class(tp_p, conf, pred_cls, target_cls))

    @property
    def fitness(self):
        return self.box.fitness() + self.pose.fitness()


class PoseValidator:
    """Box mAP + OKS keypoint mAP (reference models/yolo/pose/val.py)."""

    def __init__(self, model, spec, conf: float = 0.001, iou: float = 0.7, max_det: int = 300,
                 names: Optional[Dict[int, str]] = None, save_json: bool = False,
                 save_dir=None, class_map=None, plots: bool = False,
                 single_cls: bool = False, classes=None):
        from bsyolo_tpu.losses.pose import OKS_SIGMA
        from bsyolo_tpu.nn.heads import decode_extras, decode_keypoints

        self.spec = spec
        self.names = names or {i: n for i, n in enumerate(spec.names)}
        self.iouv = np.linspace(0.5, 0.95, 10)
        self.save_json = save_json
        self.save_dir = save_dir
        self.class_map = class_map
        nkpt, nd = spec.kpt_shape
        self.sigma = OKS_SIGMA if (nkpt == 17 and nd == 3) else np.ones(nkpt) / nkpt
        self.conf = conf
        self.plots = plots
        self.single_cls = single_cls
        self.classes = classes
        nc, strides = spec.nc, spec.head_strides
        kpt_shape = spec.kpt_shape

        def forward(variables, img):
            img = normalize_image_batch(img)  # uint8 batches: cast on device
            feats = model.apply(variables, img, train=False)
            dets, idx = detect_postprocess(
                feats, strides, nc, conf_thres=conf, iou_thres=iou, max_det=max_det,
                return_idx=True, agnostic=single_cls,
            )
            kflat = decode_extras(feats, nc)
            kpts = decode_keypoints(kflat, feats, strides, kpt_shape)
            sel = jnp.take_along_axis(kpts, jnp.maximum(idx, 0)[..., None, None], axis=1)
            return dets, sel * (idx >= 0)[..., None, None]

        self._forward = jax.jit(forward)

    def __call__(self, variables, loader, verbose: bool = True) -> "PoseMetrics":
        from bsyolo_tpu.ops.boxes import xywh2xyxy as _xywh2xyxy
        from bsyolo_tpu.utils.metrics import kpt_iou_np

        stats = {k: [] for k in ("tp", "tp_p", "conf", "pred_cls", "target_cls")}
        confusion = ConfusionMatrix(nc=self.spec.nc, conf=self.conf)
        jc = _JsonCollector(loader, self.save_dir, self.class_map) if self.save_json else None
        n_seen = 0
        for batch, pending in _pipeline_forward(self._forward, variables, loader):
            img = batch["img"]
            dets, kpts = np.asarray(pending[0]), np.asarray(pending[1])
            if self.single_cls:
                dets = _collapse_single_cls(dets)
            dets = _filter_classes(dets, self.classes)
            h, w = img.shape[1], img.shape[2]
            scale = np.asarray([w, h, w, h], np.float32)
            im_idx = batch.get("im_idx")
            for i in range(img.shape[0]):
                ki = n_seen
                n_seen += 1
                if im_idx is not None:
                    ki = int(im_idx[i])
                    if ki < 0:
                        continue  # wrap-padded duplicate row
                m = batch["mask"][i] > 0
                gt_cls = np.asarray(batch["cls"][i])[m].astype(np.float32)
                gt_xyxy = np.asarray(_xywh2xyxy(jnp.asarray(batch["bboxes"][i][m]))) * scale
                gt_kpts = np.asarray(batch["keypoints"][i])[m].copy()
                gt_kpts[..., 0] *= w
                gt_kpts[..., 1] *= h
                d = dets[i]
                keep = d[:, 4] > 0
                d, pk = d[keep], kpts[i][keep]
                if jc is not None and jc.im_files and ki < jc.n and len(d):
                    from bsyolo_tpu.utils.coco import pose_pred_to_json

                    ub = jc.unletterbox(ki, (h, w))
                    (w0, h0), r, dw, dh = ub
                    db = _boxes_to_original(d, ub)
                    k0 = pk.copy()
                    k0[..., 0] = np.clip((k0[..., 0] - dw) / r, 0, w0)
                    k0[..., 1] = np.clip((k0[..., 1] - dh) / r, 0, h0)
                    jc.jdict.extend(pose_pred_to_json(db, k0, jc.im_files[ki], class_map=jc.class_map))
                if len(d) == 0:
                    if len(gt_cls):
                        for k in ("tp", "tp_p"):
                            stats[k].append(np.zeros((0, 10), bool))
                        stats["conf"].append(np.zeros(0))
                        stats["pred_cls"].append(np.zeros(0))
                        stats["target_cls"].append(gt_cls)
                        confusion.process_batch(None, gt_xyxy, gt_cls)
                    continue
                confusion.process_batch(d, gt_xyxy, gt_cls)
                iou_b = _box_iou_np(gt_xyxy, d[:, :4])
                tp = match_predictions(d[:, 5], gt_cls, iou_b, self.iouv)
                area = (gt_xyxy[:, 2] - gt_xyxy[:, 0]) * (gt_xyxy[:, 3] - gt_xyxy[:, 1]) * 0.53
                oks = kpt_iou_np(gt_kpts, pk, area, self.sigma)
                tp_p = match_predictions(d[:, 5], gt_cls, oks, self.iouv)
                stats["tp"].append(tp)
                stats["tp_p"].append(tp_p)
                stats["conf"].append(d[:, 4])
                stats["pred_cls"].append(d[:, 5])
                stats["target_cls"].append(gt_cls)
        if jc is not None and jc.im_files:
            jc.save()
        metrics = PoseMetrics(names=self.names)
        if stats["tp"]:
            target_cls = np.concatenate(stats["target_cls"])
            if len(target_cls):
                conf = np.concatenate(stats["conf"])
                pcls = np.concatenate(stats["pred_cls"])
                metrics.process(np.concatenate(stats["tp"]), conf, pcls, target_cls)
                metrics.process_pose(np.concatenate(stats["tp_p"]), conf, pcls, target_cls)
        metrics.confusion_matrix = confusion
        if self.plots and self.save_dir is not None:
            _finalize_val_plots(confusion, metrics, self.names, self.save_dir)
        return metrics


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
        save_json: bool = False,
        save_dir=None,
        class_map=None,  # e.g. COCO80_TO_COCO91 for official COCO ids
        single_cls: bool = False,
        plots: bool = False,
        classes=None,
        save_txt: bool = False,
        save_conf: bool = False,
        forward_fn=None,
    ):
        self.model = model
        self.spec = spec
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self.pre_k = pre_k
        self.names = names or {i: n for i, n in enumerate(spec.names)}
        self.iouv = np.linspace(0.5, 0.95, 10)
        self.save_json = save_json
        self.save_dir = save_dir
        self.class_map = class_map
        self.single_cls = single_cls
        self.plots = plots
        self.classes = classes
        self.save_txt = save_txt
        self.save_conf = save_conf

        nc = spec.nc
        strides = spec.head_strides

        def forward(variables, img):
            img = normalize_image_batch(img)  # uint8 batches: cast on device
            out = model.apply(variables, img, train=False)
            if isinstance(out, dict) and "dec_bboxes" in out:  # RT-DETR path
                from bsyolo_tpu.nn.transformer import decode_rtdetr

                return decode_rtdetr(out, (img.shape[1], img.shape[2]), conf_thres=conf, max_det=max_det)
            if isinstance(out, dict) and "one2one" in out:  # v10 NMS-free path
                from bsyolo_tpu.nn.heads import decode_detections, postprocess_e2e

                preds = decode_detections(out["one2one"], strides, nc)
                return postprocess_e2e(preds, max_det=max_det, nc=nc)
            feats = out["feats"] if isinstance(out, dict) else out
            return detect_postprocess(
                feats, strides, nc, conf_thres=conf, iou_thres=iou, max_det=max_det,
                pre_k=pre_k, agnostic=single_cls, reg_max=getattr(spec, "reg_max", 16),
            )

        # forward_fn override: exported-artifact validation (AutoBackend
        # manages its own execution — not jittable from here)
        self._forward = forward_fn if forward_fn is not None else jax.jit(forward)

    def __call__(self, variables, loader, verbose: bool = True) -> DetMetrics:
        stats = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
        confusion = ConfusionMatrix(nc=self.spec.nc, conf=self.conf)
        t_infer = 0.0
        n_img = 0
        # COCO-format predictions (reference val.py:281 pred_to_json); only
        # meaningful with shuffle=False loaders, which is how val runs.
        # Same _JsonCollector plumbing as the OBB/segment/pose validators.
        jc = _JsonCollector(loader, self.save_dir, self.class_map) if self.save_json else None
        if jc is not None and not jc.im_files:
            jc = None
        im_files = getattr(getattr(loader, "dataset", None), "img_files", None)
        n_total = len(im_files) if im_files else 0
        for batch, pending in _pipeline_forward(self._forward, variables, loader):
            t0 = time.perf_counter()
            img = batch["img"]
            dets = np.asarray(pending)  # (B, max_det, 6)
            t_infer += time.perf_counter() - t0
            if self.single_cls:
                dets = _collapse_single_cls(dets)
            dets = _filter_classes(dets, self.classes)
            b, h, w = img.shape[0], img.shape[1], img.shape[2]
            if self.plots and self.save_dir is not None and n_img < 3 * b:
                self._plot_val_batch(batch, dets, n_img // max(b, 1), (h, w))
            n_img += b
            scale = np.array([w, h, w, h], np.float32)
            im_idx = batch.get("im_idx")
            for i in range(b):
                if im_idx is not None and int(im_idx[i]) < 0:
                    continue  # wrap-padded duplicate row (build.py _batches)
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
            if jc is not None or (self.save_txt and im_files):
                from bsyolo_tpu.utils.coco import pred_to_json

                for i in range(b):
                    k = int(im_idx[i]) if im_idx is not None else (n_img - b + i)
                    if k < 0 or k >= n_total:  # wrap-padded duplicates
                        continue
                    ub = _unletterbox_file(im_files[k], (h, w))
                    d = _boxes_to_original(dets[i][dets[i][:, 4] > 0], ub)
                    if jc is not None:
                        jc.jdict.extend(pred_to_json(d, im_files[k], class_map=self.class_map))
                    if self.save_txt:
                        # labels/{stem}.txt, normalized xywh [+ conf]
                        # (reference detect/val.py:270 save_one_txt) — lines
                        # written directly from the original-pixel dets, no
                        # full-resolution dummy image needed
                        from pathlib import Path as _Path

                        (w0, h0) = ub[0]
                        lines = []
                        for x1, y1, x2, y2, cf, cl in d[:, :6]:
                            parts = [str(int(cl)),
                                     f"{(x1 + x2) / 2 / w0:.6f}", f"{(y1 + y2) / 2 / h0:.6f}",
                                     f"{(x2 - x1) / w0:.6f}", f"{(y2 - y1) / h0:.6f}"]
                            if self.save_conf:
                                parts.append(f"{cf:.6f}")
                            lines.append(" ".join(parts))
                        out = _Path(self.save_dir or ".") / "labels"
                        out.mkdir(parents=True, exist_ok=True)
                        (out / f"{_Path(im_files[k]).stem}.txt").write_text(
                            "\n".join(lines) + ("\n" if lines else ""))

        if jc is not None:
            jc.save()

        metrics = DetMetrics(names=self.names)
        if stats["tp"]:
            tp = np.concatenate(stats["tp"]) if stats["tp"] else np.zeros((0, 10), bool)
            conf = np.concatenate(stats["conf"])
            pred_cls = np.concatenate(stats["pred_cls"])
            target_cls = np.concatenate(stats["target_cls"])
            if len(target_cls):
                metrics.process(tp, conf, pred_cls, target_cls)
        # exposed wait, not device wall: the pipeline overlaps batch k+1's
        # forward with batch k's host-side matching, so this is the time val
        # actually spent blocked on the device
        metrics.speed["inference"] = t_infer / max(n_img, 1) * 1000
        metrics.confusion_matrix = confusion
        if self.plots and self.save_dir is not None:
            # reference validator artifacts: confusion_matrix.png, PR/F1
            # curves, val_batch{i}_{labels,pred}.jpg (written above)
            _finalize_val_plots(confusion, metrics, self.names, self.save_dir)
        return metrics

    def _plot_val_batch(self, batch, dets, k: int, hw):
        """val_batch{k}_labels.jpg / _pred.jpg (reference validator plots)."""
        from bsyolo_tpu.ops.boxes import xyxy2xywh
        from bsyolo_tpu.utils.plotting import plot_images

        from pathlib import Path as _Path

        sd = _Path(self.save_dir)
        gt = {k2: np.asarray(v) for k2, v in batch.items() if k2 in ("img", "cls", "bboxes", "mask")}
        plot_images(gt, self.names, save_path=str(sd / f"val_batch{k}_labels.jpg"))
        h, w = hw
        scale = np.array([w, h, w, h], np.float32)
        n = dets.shape[1]
        pred = {
            "img": np.asarray(batch["img"]),
            "cls": dets[..., 5],
            "bboxes": np.asarray(xyxy2xywh(jnp.asarray(dets[..., :4]))) / scale,
            "mask": dets[..., 4] > 0,
        }
        plot_images(pred, self.names, save_path=str(sd / f"val_batch{k}_pred.jpg"))
