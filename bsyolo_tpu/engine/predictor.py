"""Streaming predictor (maps reference engine/predictor.py BasePredictor).

Source handling (image paths, dirs, globs, numpy arrays, video files, lists)
-> letterbox -> batched jitted forward+fused-decode+NMS -> boxes scaled back
to original frames -> Results stream.

Throughput design: frames are letterboxed on a background prefetch thread
and accumulated into device batches of ``batch`` frames (the final partial
batch is padded by repetition so one XLA program per (batch, imgsz) shape
serves the whole stream); the detect decode runs through the fused Pallas
postprocess (kernels/postprocess.py) where the backend supports it.
"""

from __future__ import annotations

import glob
import queue
import threading
import time
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from bsyolo_tpu.engine.results import Results
from bsyolo_tpu.kernels.postprocess import detect_postprocess
from bsyolo_tpu.ops.letterbox import letterbox_image
from bsyolo_tpu.ops.boxes import scale_boxes
from bsyolo_tpu.utils import LOGGER

IMG_SUFFIXES = {".bmp", ".jpeg", ".jpg", ".png", ".tif", ".tiff", ".webp"}
VID_SUFFIXES = {".mp4", ".avi", ".mov", ".mkv", ".m4v", ".mpg", ".mpeg", ".wmv", ".webm"}


def _stack_batch(lbs) -> np.ndarray:
    """Stack letterboxed RGB frames into one host batch.

    uint8 frames stay uint8 — the device does the /255 (4x fewer host->device
    bytes, no host float pass). Float frames (pre-scaled array sources) keep
    the classic host normalize so their contract is unchanged.
    """
    if lbs[0].dtype == np.uint8:
        return np.stack(lbs)
    return np.stack(lbs).astype(np.float32) / 255.0


def iter_source(source, vid_stride: int = 1, stream_buffer: bool = False) -> Iterator[tuple]:
    """Yield (frame BGR ndarray, path, is_video_frame)."""
    import cv2

    if isinstance(source, np.ndarray):
        yield source, "array", False
        return
    if isinstance(source, (list, tuple)):
        for s in source:
            yield from iter_source(s, vid_stride, stream_buffer)
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
    if str(source).endswith(".streams") or (isinstance(source, str) and source.isnumeric()):
        # live multi-stream / webcam path: threaded latest-frame readers
        # (reference LoadStreams, data/loaders.py)
        from bsyolo_tpu.data.streams import LoadStreams

        # stream_buffer (cfg key): True keeps every frame, False keeps the
        # latest only (reference loaders.py LoadStreams buffer arg)
        streams = LoadStreams(source, vid_stride=vid_stride, buffer=stream_buffer)
        try:
            for frames, paths in streams:
                for frame, path in zip(frames, paths):
                    yield frame, path, True
        finally:
            streams.close()
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
        batch: int = 1,
        augment: bool = False,
        stream_buffer: bool = False,
        retina_masks: bool = False,
    ):
        self.model = model
        self.spec = spec
        self.variables = variables
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self.imgsz = imgsz
        self.batch = max(int(batch), 1)
        self.classes = classes
        self.names = names or {i: n for i, n in enumerate(spec.names)}
        self.stream_buffer = stream_buffer
        self.retina_masks = retina_masks
        self.task = spec.task
        nc = spec.nc
        strides = spec.head_strides
        if augment and (
            spec.task != "detect"
            or getattr(spec.head, "module", "") in ("v10Detect", "RTDETRDecoder")
        ):
            # reference tasks.py:354-358: only the plain Detect graph
            # supports TTA; others warn and revert to single-scale
            LOGGER.warning(
                "augment=True is only supported for Detect-head models; "
                "reverting to single-scale prediction"
            )
            augment = False

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
                dets, idx = detect_postprocess(
                    feats, strides, nc, conf_thres=conf, iou_thres=iou, max_det=max_det,
                    agnostic=agnostic_nms, return_idx=True,
                )
                mc = decode_extras(feats, nc)  # (B, A, nm)
                coeffs = jnp.take_along_axis(mc, jnp.maximum(idx, 0)[..., None], axis=1)
                if retina_masks:
                    # retina_masks=True (reference segment/predict.py
                    # process_mask_native): mask assembly happens on the host
                    # at the ORIGINAL image resolution — ship coefficients +
                    # prototypes instead of an imgsz-resolution mask stack
                    return dets, coeffs * (idx >= 0)[..., None], proto
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
                dets, idx = detect_postprocess(
                    feats, strides, nc, conf_thres=conf, iou_thres=iou, max_det=max_det,
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

        elif getattr(spec.head, "module", "") == "RTDETRDecoder":
            from bsyolo_tpu.nn.transformer import decode_rtdetr

            def forward(variables, x):
                out = model.apply(variables, x, train=False)
                return decode_rtdetr(
                    out, (x.shape[1], x.shape[2]), conf_thres=conf, max_det=max_det
                )

        elif getattr(spec.head, "module", "") == "v10Detect":
            from bsyolo_tpu.nn.heads import decode_detections, postprocess_e2e

            def forward(variables, x):
                out = model.apply(variables, x, train=False)
                preds = decode_detections(out["one2one"], strides, nc)
                dets = postprocess_e2e(preds, max_det=max_det, nc=nc)
                # apply the conf threshold in the shared zero-padding convention
                ok = dets[..., 4] > conf
                return jnp.concatenate(
                    [
                        jnp.where(ok[..., None], dets[..., :4], 0.0),
                        jnp.where(ok, dets[..., 4], 0.0)[..., None],
                        jnp.where(ok, dets[..., 5], -1.0)[..., None],
                    ],
                    axis=-1,
                )

        elif augment:  # detect with test-time augmentation
            import math as _math

            from bsyolo_tpu.nn.heads import decode_detections
            from bsyolo_tpu.ops.nms import non_max_suppression

            def forward(variables, x):
                """TTA (reference tasks.py:354-392 _predict_augment /
                _descale_pred / _clip_augmented): identity, 0.83x+lr-flip and
                0.67x passes, boxes de-scaled/de-flipped to original pixels,
                tails clipped, merged through ONE NMS. All three shapes are
                static so the whole ensemble is a single compiled program."""
                b, ih, iw = x.shape[0], x.shape[1], x.shape[2]
                gs = max(strides)  # reference scale_img gs=stride.max()
                outs = []
                for si, fl in ((1.0, False), (0.83, True), (0.67, False)):
                    xi = x[:, :, ::-1, :] if fl else x
                    if si != 1.0:
                        nh, nw = int(ih * si), int(iw * si)
                        xi = jax.image.resize(xi, (b, nh, nw, x.shape[3]), method="bilinear")
                        # pad to the LARGEST stride so every level keeps the
                        # 4^i anchor-count ratio the tail-clip math assumes
                        ph = _math.ceil(ih * si / gs) * gs - nh
                        pw = _math.ceil(iw * si / gs) * gs - nw
                        # 0.447 = the reference's imagenet-mean pad value
                        # (torch_utils.py:430 scale_img)
                        xi = jnp.pad(xi, ((0, 0), (0, ph), (0, pw), (0, 0)),
                                     constant_values=0.447)
                    p = decode_detections(
                        model.apply(variables, xi, train=False), strides, nc,
                        reg_max=getattr(spec, "reg_max", 16),
                    )
                    xy = p[..., :2] / si
                    wh = p[..., 2:4] / si
                    if fl:
                        xy = jnp.concatenate([iw - xy[..., :1], xy[..., 1:]], axis=-1)
                    outs.append(jnp.concatenate([xy, wh, p[..., 4:]], axis=-1))
                # each pass votes only at the scales it is best at: the
                # unscaled pass drops its stride-32 anchors (tail), the most
                # downscaled pass its stride-8 anchors (front)
                nl = len(strides)
                g = sum(4 ** i for i in range(nl))
                outs[0] = outs[0][:, : -(outs[0].shape[1] // g)]
                outs[-1] = outs[-1][:, (outs[-1].shape[1] // g) * 4 ** (nl - 1):]
                merged = jnp.concatenate(outs, axis=1)
                return non_max_suppression(
                    merged, conf_thres=conf, iou_thres=iou, max_det=max_det,
                    nc=nc, agnostic=agnostic_nms,
                )

        else:  # detect

            def forward(variables, x):
                feats = model.apply(variables, x, train=False)
                return detect_postprocess(
                    feats,
                    strides,
                    nc,
                    conf_thres=conf,
                    iou_thres=iou,
                    max_det=max_det,
                    agnostic=agnostic_nms,
                    reg_max=spec.reg_max,  # 17-bin NAS NDFL vs 16-bin Detect
                )

        def forward_any(variables, x):
            # uint8 batches normalize on-device (fused into the stem conv's
            # input read by XLA); float inputs are assumed pre-normalized so
            # exported-artifact and array callers keep the float contract.
            if x.dtype == jnp.uint8:
                x = x.astype(jnp.float32) / 255.0
            return forward(variables, x)

        self._forward = jax.jit(forward_any)

    def _batched_inputs(self, source, vid_stride: int):
        """Background-prefetched letterboxed batches.

        A worker thread reads + letterboxes frames while the device runs the
        previous batch; partial final batches are padded by repeating the
        last frame so a single compiled program serves every batch.
        """
        q: queue.Queue = queue.Queue(maxsize=4)
        stop = object()
        err: list = []
        abandoned = threading.Event()  # consumer closed the generator early

        def put(item) -> bool:
            """Bounded put that gives up when the consumer is gone — else an
            early `break` out of predict(stream=True) would park this thread
            in q.put forever and iter_source's finally (cap.release /
            LoadStreams.close) would never run."""
            while not abandoned.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            frames, paths, lbs = [], [], []
            t_pre = 0.0
            try:
                for frame, path, _ in iter_source(source, vid_stride, self.stream_buffer):
                    t0 = time.perf_counter()
                    lb, _, _ = letterbox_image(frame, (self.imgsz, self.imgsz))
                    # BGR->RGB as a contiguous uint8 copy (1.2 MB): batches
                    # stay uint8 end-to-end on the host — the float32
                    # stack+normalize used to cost ~850 ms/batch-32 on a
                    # 1-core host and 4x the host->device bytes; the /255
                    # now runs fused on the device (see forward wrapper).
                    t_pre += time.perf_counter() - t0
                    frames.append(frame)
                    paths.append(path)
                    lbs.append(np.ascontiguousarray(lb[..., ::-1]))
                    if len(frames) == self.batch:
                        t0 = time.perf_counter()
                        x = _stack_batch(lbs)
                        t_pre += time.perf_counter() - t0
                        if not put((frames, paths, x, t_pre)):
                            return  # abandoned: unwind through iter_source finallys
                        frames, paths, lbs, t_pre = [], [], [], 0.0
                if frames:
                    n = len(frames)
                    t0 = time.perf_counter()
                    lbs = lbs + [lbs[-1]] * (self.batch - n)  # pad by repetition
                    x = _stack_batch(lbs)
                    t_pre += time.perf_counter() - t0
                    put((frames, paths, x, t_pre))
            except Exception as e:  # surface reader errors to the consumer
                err.append(e)
            finally:
                put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                frames, paths, x, t_pre = item
                yield frames, paths, jnp.asarray(x), t_pre
        finally:
            abandoned.set()  # release the producer if we exit early
        if err:
            raise err[0]

    def stream(self, source, vid_stride: int = 1, verbose: bool = False) -> Iterator[Results]:
        """Batched streaming inference (reference stream_inference:220).

        Double-buffered: batch k+1 is dispatched (async, device-side) before
        batch k's outputs are fetched, so the device->host copy (and any
        transport RTT) overlaps the next batch's compute instead of
        serializing with it. jax dispatch is asynchronous, so `_forward`
        returns immediately; only the np.asarray fetch blocks.
        """
        pending = None  # (device outs, frames, paths, pre_ms, dispatch_ms)

        def drain():
            outs_dev, frames, paths, pre_ms, disp_ms = pending
            t1 = time.perf_counter()
            outs = jax.tree_util.tree_map(np.asarray, outs_dev)  # one D2H per batch
            # inference time = dispatch + the fetch block (the time this batch
            # held the critical path); the wait for the NEXT batch's inputs
            # happens between the two and must not be attributed to the device
            inf_ms = (disp_ms + (time.perf_counter() - t1) * 1000) / len(frames)
            for i in range(len(frames)):
                yield self._emit(outs, i, frames[i], paths[i], pre_ms, inf_ms, verbose)

        for frames, paths, x, t_pre in self._batched_inputs(source, vid_stride):
            t1 = time.perf_counter()
            outs_dev = self._forward(self.variables, x)  # async dispatch
            disp_ms = (time.perf_counter() - t1) * 1000
            if pending is not None:
                yield from drain()
            pending = (outs_dev, frames, paths, t_pre * 1000 / len(frames), disp_ms)
        if pending is not None:
            yield from drain()

    def _emit(self, outs, i, frame, path, pre_ms, inf_ms, verbose) -> Results:
        """Host-side per-frame postprocess of batch outputs."""
        t2 = time.perf_counter()

        def _speed():
            return {
                "preprocess": pre_ms,
                "inference": inf_ms,
                "postprocess": (time.perf_counter() - t2) * 1000,
            }

        if self.task == "classify":
            res = Results(frame, path, self.names, probs=outs[i])
            res.speed = _speed()
            return res
        if self.task == "pose":
            dets, kpts = outs[0][i], outs[1][i]
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
            res.speed = _speed()
            return res
        if self.task == "obb":
            dets = outs[i]
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
            res.speed = _speed()
            return res
        if self.task == "segment":
            if self.retina_masks:
                res = self._to_results_retina(outs[0][i], outs[1][i], outs[2][i], frame, path)
            else:
                res = self._to_results(outs[0][i], frame, path, masks=outs[1][i])
            res.speed = _speed()
            if verbose:
                LOGGER.info(f"{path}: {res.verbose_line}")
            return res
        res = self._to_results(outs[i], frame, path)
        res.speed = _speed()
        if verbose:
            LOGGER.info(f"{path}: {res.verbose_line} ({res.speed['inference']:.1f} ms)")
        return res

    def _keep_and_filter(self, dets: np.ndarray, extras: Optional[np.ndarray] = None):
        """Shared postprocess preamble: drop zero-conf padding rows and apply
        the class whitelist; `extras` (masks/coeffs) follow the same rows."""
        keep = dets[:, 4] > 0
        d = dets[keep]
        if extras is not None:
            extras = extras[keep]
        if self.classes is not None and len(d):
            sel = np.isin(d[:, 5].astype(int), self.classes)
            d = d[sel]
            if extras is not None:
                extras = extras[sel]
        return d, extras

    def _to_results(
        self, dets: np.ndarray, frame: np.ndarray, path: str, masks: Optional[np.ndarray] = None
    ) -> Results:
        d, masks = self._keep_and_filter(dets, masks)
        out_masks = None
        if len(d):
            boxes = np.asarray(
                scale_boxes((self.imgsz, self.imgsz), jnp.asarray(d[:, :4]), frame.shape[:2])
            )
            d = np.concatenate([boxes, d[:, 4:6]], -1)
            if masks is not None and len(masks):
                # undo the letterbox: crop the padded region then resize
                import cv2

                from bsyolo_tpu.ops.letterbox import letterbox_params

                # one source of truth for the letterbox inversion arithmetic
                h0, w0 = frame.shape[:2]
                gain, (pw_f, ph_f), (ws, hs) = letterbox_params(
                    (h0, w0), (self.imgsz, self.imgsz)
                )
                ph, pw = round(ph_f - 0.1), round(pw_f - 0.1)
                cropped = masks[:, ph : ph + hs, pw : pw + ws]
                out_masks = np.stack(
                    [cv2.resize(m, (w0, h0), interpolation=cv2.INTER_LINEAR) for m in cropped]
                )
                out_masks = (out_masks > 0.5).astype(np.float32)
        else:
            d = np.zeros((0, 6), np.float32)
        return Results(frame, path, self.names, boxes=d, masks=out_masks)

    def _to_results_retina(
        self, dets: np.ndarray, coeffs: np.ndarray, proto: np.ndarray, frame: np.ndarray, path: str
    ) -> Results:
        """Native-resolution mask assembly (reference ops.py:696
        process_mask_native): sigmoid(coeffs @ proto) at prototype res, the
        letterbox padding stripped at that res, bilinear up to the ORIGINAL
        image size, then box-cropped in original pixels — sharper mask edges
        than the imgsz-resolution device path."""
        import cv2

        d, c = self._keep_and_filter(dets, coeffs)
        if not len(d):
            return Results(frame, path, self.names, boxes=np.zeros((0, 6), np.float32))
        h0, w0 = frame.shape[:2]
        boxes = np.asarray(
            scale_boxes((self.imgsz, self.imgsz), jnp.asarray(d[:, :4]), frame.shape[:2])
        )
        d = np.concatenate([boxes, d[:, 4:6]], -1)
        ph, pw, nm = proto.shape
        m = c.astype(np.float32) @ proto.reshape(-1, nm).T.astype(np.float32)
        m = 1.0 / (1.0 + np.exp(-m.reshape(-1, ph, pw)))
        from bsyolo_tpu.ops.letterbox import letterbox_params

        _, (pad_w, pad_h), _ = letterbox_params((h0, w0), (self.imgsz, self.imgsz))
        top = int(round(pad_h / self.imgsz * ph - 0.1))
        left = int(round(pad_w / self.imgsz * pw - 0.1))
        bottom = ph - max(top, 0)
        right = pw - max(left, 0)
        m = m[:, max(top, 0) : bottom, max(left, 0) : right]
        m = np.stack([cv2.resize(x, (w0, h0), interpolation=cv2.INTER_LINEAR) for x in m])
        yy = np.arange(h0, dtype=np.float32)[None, :, None]
        xx = np.arange(w0, dtype=np.float32)[None, None, :]
        x1 = boxes[:, 0].reshape(-1, 1, 1)
        y1 = boxes[:, 1].reshape(-1, 1, 1)
        x2 = boxes[:, 2].reshape(-1, 1, 1)
        y2 = boxes[:, 3].reshape(-1, 1, 1)
        m = m * ((xx >= x1) & (xx < x2) & (yy >= y1) & (yy < y2))
        return Results(frame, path, self.names, boxes=d, masks=(m > 0.5).astype(np.float32))

    def __call__(self, source, **kwargs) -> List[Results]:
        return list(self.stream(source, **kwargs))
