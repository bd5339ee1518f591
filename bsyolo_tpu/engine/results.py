"""Results API (maps reference ultralytics/engine/results.py).

Containers returned by predict/track: ``Results`` with ``Boxes`` (and later
``Masks``/``Keypoints``/``Probs``/``OBB``), plotting, and save/json helpers.
Data lives in host numpy — by the time results exist, the device work is done.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


class Boxes:
    """Detection boxes (reference results.py:939). data: (n, 6|7) columns
    x1, y1, x2, y2, [track_id], conf, cls."""

    def __init__(self, data: np.ndarray, orig_shape):
        if data.ndim == 1:
            data = data[None]
        self.data = data
        self.orig_shape = orig_shape
        self.is_track = data.shape[-1] == 7

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        return Boxes(self.data[idx], self.orig_shape)

    @property
    def xyxy(self):
        return self.data[:, :4]

    @property
    def conf(self):
        return self.data[:, -2]

    @property
    def cls(self):
        return self.data[:, -1]

    @property
    def id(self):
        return self.data[:, -3] if self.is_track else None

    @property
    def xywh(self):
        b = self.data[:, :4]
        return np.stack(
            [(b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2, b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]],
            -1,
        )

    @property
    def xyxyn(self):
        h, w = self.orig_shape
        return self.xyxy / np.asarray([w, h, w, h], np.float32)

    @property
    def xywhn(self):
        h, w = self.orig_shape
        return self.xywh / np.asarray([w, h, w, h], np.float32)


class Masks:
    """Segmentation masks (reference results.py:1157). data: (n, H, W) binary."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = data
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    @property
    def xy(self):
        """Mask contours in pixel coords (needs cv2)."""
        import cv2

        out = []
        for m in self.data:
            cs, _ = cv2.findContours((m > 0.5).astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
            out.append(max(cs, key=cv2.contourArea).reshape(-1, 2).astype(np.float32) if cs else np.zeros((0, 2), np.float32))
        return out

    @property
    def xyn(self):
        """Mask contours normalized to [0, 1] (reference Masks.xyn)."""
        h, w = self.orig_shape
        scale = np.asarray([w, h], np.float32)
        return [c / scale for c in self.xy]


class Keypoints:
    """Pose keypoints (reference results.py:1255). data: (n, nkpt, 2|3)."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = data
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    @property
    def xy(self):
        return self.data[..., :2]

    @property
    def xyn(self):
        h, w = self.orig_shape
        return self.xy / np.asarray([w, h], np.float32)

    @property
    def conf(self):
        return self.data[..., 2] if self.data.shape[-1] == 3 else None


class OBBoxes:
    """Oriented boxes (reference results.py:1520 OBB). data: (n, 7|8) columns
    x, y, w, h, [track_id], conf, cls, angle."""

    def __init__(self, data: np.ndarray, orig_shape):
        if data.ndim == 1:
            data = data[None]
        self.data = data
        self.orig_shape = orig_shape
        self.is_track = data.shape[-1] == 8

    def __len__(self):
        return len(self.data)

    @property
    def xywhr(self):
        d = self.data
        return np.concatenate([d[:, :4], d[:, -1:]], axis=-1)

    @property
    def conf(self):
        return self.data[:, -3]

    @property
    def cls(self):
        return self.data[:, -2]

    @property
    def xyxyxyxy(self):
        import jax.numpy as jnp

        from bsyolo_tpu.ops.obb import xywhr2xyxyxyxy

        return np.asarray(xywhr2xyxyxyxy(jnp.asarray(self.xywhr)))


class Probs:
    """Classification probabilities (reference results.py:1379)."""

    def __init__(self, data: np.ndarray):
        self.data = data

    @property
    def top1(self):
        return int(np.argmax(self.data))

    @property
    def top5(self):
        return np.argsort(-self.data)[:5].tolist()

    @property
    def top1conf(self):
        return float(self.data[self.top1])

    @property
    def top5conf(self):
        return self.data[self.top5]


class Results:
    """Single-image inference result (reference results.py:187)."""

    def __init__(
        self,
        orig_img: np.ndarray,
        path: str,
        names: Dict[int, str],
        boxes: Optional[np.ndarray] = None,
        masks: Optional[np.ndarray] = None,
        probs: Optional[np.ndarray] = None,
        keypoints: Optional[np.ndarray] = None,
        obb: Optional[np.ndarray] = None,
        speed: Optional[Dict[str, float]] = None,
    ):
        self.orig_img = orig_img
        self.orig_shape = orig_img.shape[:2]
        self.path = path
        self.names = names
        self.boxes = Boxes(boxes, self.orig_shape) if boxes is not None else None
        self.masks = Masks(masks, self.orig_shape) if masks is not None else None
        self.probs = Probs(probs) if probs is not None else None
        self.keypoints = Keypoints(keypoints, self.orig_shape) if keypoints is not None else None
        self.obb = OBBoxes(obb, self.orig_shape) if obb is not None else None
        self.speed = speed or {}

    def __len__(self):
        return len(self.boxes) if self.boxes is not None else 0

    def __getitem__(self, idx):
        return Results(
            self.orig_img,
            self.path,
            self.names,
            boxes=self.boxes.data[idx] if self.boxes is not None else None,
        )

    def new(self, boxes: Optional[np.ndarray] = None):
        return Results(self.orig_img, self.path, self.names, boxes=boxes)

    def plot(
        self,
        line_width: Optional[int] = None,
        font_scale: float = 0.5,
        conf: bool = True,
        labels: bool = True,
        boxes: bool = True,
        masks: bool = True,
        kpts: bool = True,
        kpt_radius: int = 3,
    ) -> np.ndarray:
        """Draw detections on a copy of the original image (BGR).

        Mirrors reference Results.plot (engine/results.py) toggles: conf /
        labels / boxes / masks / kpts map to the cfg show_conf / show_labels /
        show_boxes keys; mask overlays are alpha-blended per class color,
        keypoints drawn as filled circles, OBBs as 4-point polylines."""
        import cv2

        img = self.orig_img.copy()
        lw = line_width or max(round(sum(img.shape[:2]) / 2 * 0.003), 2)
        if masks and self.masks is not None and len(self.masks.data):
            overlay = img.copy()
            for j, m in enumerate(self.masks.data):
                cls_j = (
                    int(self.boxes.data[j][-1])
                    if self.boxes is not None and j < len(self.boxes.data)
                    else j
                )
                overlay[m > 0.5] = _class_color(cls_j)
            img = cv2.addWeighted(img, 0.55, overlay, 0.45, 0)
        if boxes and self.boxes is not None:
            for row in self.boxes.data:
                x1, y1, x2, y2 = row[:4].astype(int)
                cf, cls = row[-2], int(row[-1])
                color = _class_color(cls)
                cv2.rectangle(img, (x1, y1), (x2, y2), color, lw)
                if labels:
                    tid = f"id:{int(row[4])} " if self.boxes.is_track else ""
                    label = f"{tid}{self.names.get(cls, cls)}" + (f" {cf:.2f}" if conf else "")
                    cv2.putText(
                        img, label, (x1, max(y1 - 4, 12)), cv2.FONT_HERSHEY_SIMPLEX,
                        font_scale, color, max(lw - 1, 1),
                    )
        if boxes and self.obb is not None:
            for row in self.obb.data:
                # OBBoxes columns: x, y, w, h, [track_id], conf, cls, angle(rad)
                cx, cy, w, h = row[:4]
                ang, cls, cf = row[-1], int(row[-2]), row[-3]
                color = _class_color(cls)
                pts = cv2.boxPoints(((float(cx), float(cy)), (float(w), float(h)),
                                     float(np.degrees(ang))))
                cv2.polylines(img, [pts.astype(np.int32)], True, color, lw)
                if labels:
                    label = f"{self.names.get(cls, cls)}" + (f" {cf:.2f}" if conf else "")
                    cv2.putText(img, label, (int(cx), max(int(cy) - 4, 12)),
                                cv2.FONT_HERSHEY_SIMPLEX, font_scale, color, max(lw - 1, 1))
        if kpts and self.keypoints is not None:
            for inst in self.keypoints.data:
                for p in inst:
                    if len(p) > 2 and p[2] < 0.5:
                        continue
                    cv2.circle(img, (int(p[0]), int(p[1])), kpt_radius, (0, 0, 255), -1)
        return img

    def save(self, filename: str, **plot_kwargs):
        import cv2

        Path(filename).parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(filename), self.plot(**plot_kwargs))
        return filename

    def to_json(self) -> str:
        # one row builder for json/df/csv (summary handles boxes, OBB, probs)
        return json.dumps(self.summary(), indent=2)

    def save_txt(self, txt_file: str, save_conf: bool = False):
        """YOLO-format txt (reference results.py:716 save_txt): detect lines
        are `cls xywhn [conf]`; segment lines replace the box with the mask's
        normalized polygon; pose appends `x y [v]` per keypoint; OBB writes
        the 8 normalized corner coords; classify writes top-5 `conf name`."""
        h, w = self.orig_shape
        lines = []
        if self.probs is not None:
            for j in self.probs.top5:
                lines.append(f"{float(self.probs.data[j]):.2f} {self.names.get(int(j), j)}")
        elif self.obb is not None:
            import jax.numpy as jnp

            from bsyolo_tpu.ops.obb import xywhr2xyxyxyxy

            for row in self.obb.data:
                rbox = np.concatenate([row[:4], row[-1:]])
                poly = np.asarray(xywhr2xyxyxyxy(jnp.asarray(rbox[None])))[0].reshape(-1)
                poly = poly / np.asarray([w, h] * 4, np.float32)
                parts = [str(int(row[-2])), *(f"{v:.6f}" for v in poly)]
                if save_conf:
                    parts.append(f"{float(row[-3]):.6f}")
                lines.append(" ".join(parts))
        elif self.boxes is not None:
            seg_polys = self.masks.xyn if self.masks is not None else None
            kpts = self.keypoints if self.keypoints is not None else None
            for j, (row, xywhn) in enumerate(zip(self.boxes.data, self.boxes.xywhn)):
                cls, conf = int(row[-1]), float(row[-2])
                if seg_polys is not None and j < len(seg_polys) and len(seg_polys[j]):
                    parts = [str(cls), *(f"{v:.6f}" for v in seg_polys[j].reshape(-1))]
                else:
                    parts = [str(cls), *(f"{v:.6f}" for v in xywhn)]
                    if kpts is not None and j < len(kpts.data):
                        kn = kpts.xyn[j]
                        kc = kpts.conf[j] if kpts.conf is not None else None
                        for ki in range(len(kn)):
                            parts += [f"{kn[ki][0]:.6f}", f"{kn[ki][1]:.6f}"]
                            if kc is not None:
                                parts.append(f"{kc[ki]:.6f}")
                if save_conf:
                    parts.append(f"{conf:.6f}")
                lines.append(" ".join(parts))
        Path(txt_file).parent.mkdir(parents=True, exist_ok=True)
        Path(txt_file).write_text("\n".join(lines) + ("\n" if lines else ""))
        return txt_file

    @property
    def verbose_line(self) -> str:
        if not len(self):
            return "(no detections)"
        counts: Dict[str, int] = {}
        for c in self.boxes.cls.astype(int):
            name = self.names.get(int(c), str(c))
            counts[name] = counts.get(name, 0) + 1
        return ", ".join(f"{v} {k}{'s' if v > 1 else ''}" for k, v in counts.items())

    def summary(self, normalize: bool = False) -> list:
        """List-of-dicts summary (reference results.py summary); the shared
        substrate of to_df/to_csv."""
        rows = []
        h, w = self.orig_shape
        div = (w, h, w, h) if normalize else (1, 1, 1, 1)
        if self.probs is not None:
            top = int(self.probs.top1)
            return [{"name": self.names.get(top, str(top)), "class": top,
                     "confidence": round(float(self.probs.top1conf), 5)}]
        if self.boxes is None and self.obb is not None:
            # OBB predictions carry no axis-aligned boxes (reference summary
            # falls back to obb the same way)
            # OBBoxes columns: x, y, w, h, [track_id], conf, cls, angle
            for row in self.obb.data:
                cls = int(row[-2])
                rec = {
                    "name": self.names.get(cls, str(cls)),
                    "class": cls,
                    "confidence": round(float(row[-3]), 5),
                }
                if self.obb.is_track:
                    rec["track_id"] = int(row[4])
                rows.append(rec)
                rec["box"] = {
                    "cx": round(float(row[0]) / div[0], 5 if normalize else 2),
                    "cy": round(float(row[1]) / div[1], 5 if normalize else 2),
                    "w": round(float(row[2]) / div[0], 5 if normalize else 2),
                    "h": round(float(row[3]) / div[1], 5 if normalize else 2),
                    "angle": round(float(row[-1]), 5),
                }
            return rows
        if self.boxes is not None:
            for i, row in enumerate(self.boxes.data):
                cls = int(row[-1])
                rec = {
                    "name": self.names.get(cls, str(cls)),
                    "class": cls,
                    "confidence": round(float(row[-2]), 5),
                    "box": {k: round(float(v) / d, 5 if normalize else 2)
                            for k, v, d in zip("x1 y1 x2 y2".split(), row[:4],
                                               div)},
                }
                if self.boxes.is_track:
                    rec["track_id"] = int(row[4])
                if self.keypoints is not None and i < len(self.keypoints.data):
                    k = self.keypoints.data[i]
                    rec["keypoints"] = {
                        "x": [round(float(v) / div[0], 5 if normalize else 2) for v in k[:, 0]],
                        "y": [round(float(v) / div[1], 5 if normalize else 2) for v in k[:, 1]],
                    }
                rows.append(rec)
        return rows

    def to_df(self):
        """pandas DataFrame of summary() rows (reference to_df; import-gated)."""
        import pandas as pd

        return pd.json_normalize(self.summary())

    def to_csv(self) -> str:
        return self.to_df().to_csv(index=False)

    def save_crop(self, save_dir, file_name: str = None) -> int:
        """Save per-detection crops under save_dir/<class name>/ (reference
        results.py save_crop). Returns the number of crops written."""
        import cv2

        n = 0
        if self.boxes is None:
            return 0
        stem = Path(file_name or self.path or "im").stem or "im"
        h, w = self.orig_shape
        for i, row in enumerate(self.boxes.data):
            cls = int(row[-1])
            name = self.names.get(cls, str(cls))
            x1, y1, x2, y2 = (int(max(0, row[0])), int(max(0, row[1])),
                              int(min(w, row[2])), int(min(h, row[3])))
            if x2 <= x1 or y2 <= y1:
                continue
            d = Path(save_dir) / name
            d.mkdir(parents=True, exist_ok=True)
            out = d / f"{stem}_{i}.jpg"
            cv2.imwrite(str(out), self.orig_img[y1:y2, x1:x2])
            n += 1
        return n

    def update(self, boxes: Optional[np.ndarray] = None, masks: Optional[np.ndarray] = None,
               probs: Optional[np.ndarray] = None, obb: Optional[np.ndarray] = None):
        """In-place replacement of prediction tensors (reference results.py update)."""
        if boxes is not None:
            self.boxes = Boxes(boxes, self.orig_shape)
        if masks is not None:
            self.masks = Masks(masks, self.orig_shape)
        if probs is not None:
            self.probs = Probs(probs)
        if obb is not None:
            self.obb = OBBoxes(obb, self.orig_shape)
        return self

    # torch-API compat shims: Results here is numpy/host-backed already
    def cpu(self):
        return self

    def numpy(self):
        return self


def _class_color(cls: int):
    palette = [
        (56, 56, 255), (151, 157, 255), (31, 112, 255), (29, 178, 255), (49, 210, 207),
        (10, 249, 72), (23, 204, 146), (134, 219, 61), (52, 147, 26), (187, 212, 0),
        (168, 153, 44), (255, 194, 0), (147, 69, 52), (255, 115, 100), (236, 24, 0),
        (255, 56, 132), (133, 0, 82), (255, 56, 203), (200, 149, 255), (199, 55, 255),
    ]
    return palette[cls % len(palette)]
