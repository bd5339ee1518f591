"""YOLO-format dataset (maps reference ultralytics/data/{base,dataset,utils}.py).

Reads the reference's on-disk layout unchanged: a dataset YAML with
path/train/val/names (e.g. the fork's cfg/datasets/car.yaml), images under
``images/`` with labels in sibling ``labels/*.txt`` files of
``class cx cy w h`` normalized rows (reference data/utils.py img2label_paths).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np
import yaml

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

IMG_FORMATS = {"bmp", "dng", "jpeg", "jpg", "mpo", "png", "tif", "tiff", "webp", "pfm"}


def _rbox_from_corners(pts: np.ndarray) -> np.ndarray:
    """Fit (cx, cy, w, h, r) to 4 corner points via minAreaRect with the
    angle canonicalized into the OBB head's (-pi/4, 3pi/4) range (reference
    ops.xyxyxyxy2xywhr semantics)."""
    (cx, cy), (bw, bh), ang = cv2.minAreaRect(np.asarray(pts, np.float32))
    r = np.deg2rad(ang)
    if bw < bh:
        bw, bh = bh, bw
        r += np.pi / 2
    while r >= 3 * np.pi / 4:
        r -= np.pi
    while r < -np.pi / 4:
        r += np.pi
    return np.asarray([cx, cy, bw, bh, r], np.float32)


def load_dataset_yaml(path) -> Dict:
    """Load + resolve a dataset YAML (reference data/utils.py check_det_dataset).

    A bare name like ``coco8.yaml`` resolves against the bundled
    cfg/datasets tree, mirroring the reference's packaged-config lookup.
    """
    path = Path(path)
    bundled = False
    if not path.exists() and path.name == str(path):
        from bsyolo_tpu.cfg import CFG_ROOT

        cand = CFG_ROOT / "datasets" / path.name
        if cand.exists():
            path, bundled = cand, True
    d = yaml.safe_load(path.read_text())
    root = Path(d.get("path", path.parent))
    if not root.is_absolute():
        if bundled:
            # bundled configs carry the reference's "../datasets/<name>"
            # convention: resolve against the user's datasets_dir setting
            # (reference check_det_dataset + DATASETS_DIR semantics)
            from bsyolo_tpu.utils.settings import SettingsManager

            root = Path(SettingsManager()["datasets_dir"]) / root.name
        else:
            root = (path.parent / root).resolve()
    out = dict(d)
    out["path"] = root

    def _resolve(v):
        if isinstance(v, (list, tuple)):  # multi-dir splits (VOC.yaml etc.)
            return [_resolve(x) for x in v]
        p = Path(v)
        return str(p if p.is_absolute() else root / p)

    for split in ("train", "val", "test"):
        if d.get(split):
            out[split] = _resolve(d[split])
    names = d.get("names", {})
    if isinstance(names, list):
        names = dict(enumerate(names))
    out["names"] = {int(k): str(v) for k, v in names.items()}
    out["nc"] = d.get("nc", len(out["names"]))
    return out


def img2label_path(img_path: str) -> str:
    """images/xxx.jpg -> labels/xxx.txt (reference data/utils.py:45)."""
    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"
    return sb.join(img_path.rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt"


class YOLODataset:
    """Detection dataset: file listing + label parsing + augmentation hooks."""

    def __init__(
        self,
        img_path: str,
        imgsz: int = 640,
        augment: bool = True,
        hyp: Optional[Dict] = None,
        max_gt: int = 128,
        single_cls: bool = False,
        fraction: float = 1.0,
        task: str = "detect",
        mask_ratio: int = 4,
        flip_idx: Optional[List[int]] = None,
        cache: object = False,
    ):
        self.task = task
        self.mask_ratio = mask_ratio
        # Left/right keypoint permutation applied on hflip (reference
        # augment.py:1470); without it flipped pose samples carry side-swapped
        # keypoint labels. None => hflip disabled for pose (augment.py:2321-2326).
        self.flip_idx = None if flip_idx is None else np.asarray(flip_idx, np.int64)
        self.img_files = self._list_images(img_path)
        if fraction < 1.0:
            self.img_files = self.img_files[: max(1, round(len(self.img_files) * fraction))]
        if not self.img_files:
            raise FileNotFoundError(f"no images found in {img_path}")
        self.label_files = [img2label_path(f) for f in self.img_files]
        self.imgsz = imgsz
        self.augment = augment
        self.hyp = dict(hyp or {})
        self.max_gt = max_gt
        self.single_cls = single_cls
        if not self._load_cache():
            self.labels = [self._load_label(i) for i in range(len(self.img_files))]
            self._save_cache()
        # decoded-image cache (reference base.py cache_images, cache: ram|disk).
        # "ram": eager preload of the pre-resized images — done at init so
        # fork workers inherit the pages copy-on-write (shared, zero-copy).
        # "disk": .npy sibling per image, decoded+resized once, mmap-read after.
        if cache is True:
            cache = "ram"
        self._cache_mode = cache if cache in ("ram", "disk") else None
        self._ims: Optional[List[np.ndarray]] = None
        if self._cache_mode == "ram":
            self._ims = [self._read_image(i) for i in range(len(self.img_files))]

    # --- label cache (reference data/base.py *.cache semantics) -------------
    def _cache_path(self) -> Path:
        d = Path(self.label_files[0]).parent if self.label_files else Path(".")
        return d.with_suffix(".cache.npz")

    def _cache_hash(self) -> str:
        import hashlib

        h = hashlib.sha1()
        # v2: obb caches additionally carry raw corner points (rcorners)
        h.update(f"v2:{self.task}:{self.single_cls}".encode())
        for f in self.label_files:
            try:
                st = os.stat(f)
                h.update(f"{f}:{st.st_mtime_ns}:{st.st_size}".encode())
            except OSError:
                h.update(f"{f}:missing".encode())
        return h.hexdigest()

    def _save_cache(self):
        try:
            def obj(x):
                a = np.empty(1, dtype=object)
                a[0] = x
                return a

            payload = {
                "hash": self._cache_hash(),
                "labels": obj(self.labels),
                "segments": obj(getattr(self, "segments", {})),
                "keypoints": obj(getattr(self, "keypoints", {})),
                "rboxes": obj(getattr(self, "rboxes", {})),
                "rcorners": obj(getattr(self, "rcorners", {})),
            }
            np.savez(self._cache_path(), **payload, allow_pickle=True)
        except OSError:
            pass  # read-only label dirs are fine; caching is best-effort

    def _load_cache(self) -> bool:
        path = self._cache_path()
        if not path.exists():
            return False
        try:
            z = np.load(path, allow_pickle=True)
            if str(z["hash"]) != self._cache_hash():
                return False
            self.labels = list(z["labels"][0])
            self.segments = dict(z["segments"][0])
            self.keypoints = dict(z["keypoints"][0])
            self.rboxes = dict(z["rboxes"][0])
            self.rcorners = dict(z["rcorners"][0])
            return True
        except Exception:
            return False

    @staticmethod
    def _list_images(img_path) -> List[str]:
        if isinstance(img_path, (list, tuple)):  # multi-dir splits (VOC.yaml)
            out: List[str] = []
            for p in img_path:
                out.extend(YOLODataset._list_images(p))
            return out
        p = Path(img_path)
        files: List[str] = []
        if p.is_dir():
            files = sorted(
                str(f) for f in p.rglob("*") if f.suffix.lower().lstrip(".") in IMG_FORMATS
            )
        elif p.is_file() and p.suffix == ".txt":  # file list
            base = p.parent
            for line in p.read_text().splitlines():
                line = line.strip()
                if line:
                    fp = Path(line)
                    files.append(str(fp if fp.is_absolute() else base / fp))
        elif p.is_file():
            files = [str(p)]
        return files

    def _load_label(self, i: int):
        """Returns (cls (n,), xywh-normalized (n, 4)). Extra per-task label
        payloads are kept on the dataset:
        - segment: polygon rows (class x1 y1 ... xn yn) -> self.segments[i]
        - pose: rows (class cx cy w h kx ky v ...) -> self.keypoints[i]
        - obb: corner rows (class x1 y1 ... x4 y4) -> self.rboxes[i] (xywhr)
        """
        lp = self.label_files[i]
        empty = (np.zeros((0,), np.float32), np.zeros((0, 4), np.float32))
        if not hasattr(self, "segments"):
            self.segments = {}
            self.keypoints = {}
            self.rboxes = {}
            self.rcorners = {}
        if not os.path.exists(lp):
            return empty
        rows, polys, kpts, rbs, rcs = [], [], [], [], []
        for line in Path(lp).read_text().splitlines():
            parts = line.split()
            if self.task == "segment" and len(parts) >= 7 and len(parts) % 2 == 1:
                vals = [float(x) for x in parts]
                poly = np.asarray(vals[1:], np.float32).reshape(-1, 2)
                xy_min, xy_max = poly.min(0), poly.max(0)
                cxy = (xy_min + xy_max) / 2
                wh = xy_max - xy_min
                rows.append([vals[0], cxy[0], cxy[1], wh[0], wh[1]])
                polys.append(poly)
            elif self.task == "obb" and len(parts) == 9:
                vals = [float(x) for x in parts]
                pts = np.asarray(vals[1:], np.float32).reshape(4, 2)
                rb = _rbox_from_corners(pts)
                rows.append([vals[0], rb[0], rb[1], rb[2], rb[3]])
                rbs.append(rb)
                rcs.append(pts)  # raw normalized corners: the augment pipeline
                # warps these (reference carries OBB as 4-pt segments through
                # Mosaic/RandomPerspective, dataset.py:204 update_labels_info)
            elif self.task == "pose" and len(parts) > 5 and (len(parts) - 5) % 3 == 0:
                vals = [float(x) for x in parts]
                rows.append(vals[:5])
                kpts.append(np.asarray(vals[5:], np.float32).reshape(-1, 3))
            elif len(parts) >= 5:
                rows.append([float(x) for x in parts[:5]])
                polys.append(None)
                kpts.append(None)
                if self.task == "obb":  # keep rbox/corner payloads row-aligned
                    rbs.append(None)  # in mixed-format OBB files
                    rcs.append(None)  # (None = axis-aligned rect fallback)
        if not rows:
            return empty
        if polys:
            self.segments[i] = polys
        if kpts and self.task == "pose":
            self.keypoints[i] = kpts
        if rbs:
            self.rboxes[i] = rbs
            self.rcorners[i] = rcs
        arr = np.asarray(rows, np.float32)
        cls = arr[:, 0] * (0 if self.single_cls else 1)
        return cls, np.clip(arr[:, 1:5], 0, 1)

    def __len__(self):
        return len(self.img_files)

    def load_image(self, i: int) -> np.ndarray:
        if self._ims is not None:
            return self._ims[i].copy()  # downstream transforms may write in place
        if self._cache_mode == "disk":
            # key includes imgsz — the cached array is pre-resized, so a run
            # at a different imgsz must not reuse stale-resolution bytes
            npy = Path(self.img_files[i]).with_suffix(f".{self.imgsz}.npy")
            if npy.exists():
                try:
                    return np.load(npy)
                except (ValueError, EOFError, OSError):
                    pass  # partial/corrupt file from an interrupted writer
            im = self._read_image(i)
            try:
                # atomic publish: fork-pool workers race on the same uncached
                # image (mosaic samples random indices) — write to a per-pid
                # tmp sibling and rename so readers never see partial bytes
                tmp = npy.with_suffix(f".{os.getpid()}.tmp.npy")
                np.save(tmp, im)
                os.replace(tmp, npy)
            except OSError:  # read-only dataset dir: fall back to plain reads
                pass
            return im
        return self._read_image(i)

    def _read_image(self, i: int) -> np.ndarray:
        im = cv2.imread(self.img_files[i])  # BGR
        if im is None:
            raise FileNotFoundError(self.img_files[i])
        # pre-resize long side to imgsz (reference base.py load_image rect logic)
        h0, w0 = im.shape[:2]
        r = self.imgsz / max(h0, w0)
        if r != 1:
            interp = cv2.INTER_LINEAR if (self.augment or r > 1) else cv2.INTER_AREA
            im = cv2.resize(im, (min(int(w0 * r), self.imgsz), min(int(h0 * r), self.imgsz)), interpolation=interp)
        return im

    def label_pixels(self, i: int, shape: Tuple[int, int]) -> Tuple[np.ndarray, np.ndarray]:
        """(cls, xyxy in pixels of the pre-resized image)."""
        cls, xywh = self.labels[i]
        h, w = shape
        if len(xywh) == 0:
            return cls, np.zeros((0, 4), np.float32)
        cx, cy, bw, bh = xywh[:, 0] * w, xywh[:, 1] * h, xywh[:, 2] * w, xywh[:, 3] * h
        xyxy = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1)
        return cls, xyxy

    def image_shapes(self) -> np.ndarray:
        """(N, 2) original (h, w) per image, read from file headers only
        (PIL lazy open — no pixel decode); cached after the first call.
        Powers rect-val aspect bucketing (build.py)."""
        if getattr(self, "_shapes", None) is None:
            from PIL import Image

            shapes = np.zeros((len(self.img_files), 2), np.int32)
            for i, f in enumerate(self.img_files):
                try:
                    with Image.open(f) as im:
                        w, h = im.size
                except Exception:
                    h = w = self.imgsz
                shapes[i] = (h, w)
            self._shapes = shapes
        return self._shapes

    def get_sample(self, i: int, rng: np.random.Generator, mosaic: bool = True,
                   shape: Optional[Tuple[int, int]] = None) -> Dict:
        """One training sample dict: img (uint8 RGB — batches ship to device
        at 1/4 the f32 bytes; the compiled step normalizes via
        ops.normalize_image_batch), cls, bboxes (xywh-n), mask; for
        task='segment' also masks ((imgsz/ratio)^2 overlap-encoded)."""
        from bsyolo_tpu.data.augment import format_labels, train_transform

        if self.task == "segment":
            return self._get_segment_sample(i, rng, mosaic=mosaic, shape=shape)
        if self.task == "pose":
            return self._get_pose_sample(i, rng, mosaic=mosaic, shape=shape)
        if self.task == "obb":
            return self._get_obb_sample(i, rng, mosaic=mosaic, shape=shape)
        if self.augment:
            use_mosaic = mosaic and rng.random() < self.hyp.get("mosaic", 1.0)
            if use_mosaic:
                idxs = [i] + list(rng.integers(0, len(self), 3))
            else:
                idxs = [i]
            imgs = [self.load_image(j) for j in idxs]
            labels = [self.label_pixels(j, imgs[k].shape[:2]) for k, j in enumerate(idxs)]
            img, cls, boxes = train_transform(
                imgs, labels, self.imgsz, rng, self.hyp, mosaic=use_mosaic
            )
            if use_mosaic and rng.random() < self.hyp.get("mixup", 0.0):
                # MixUp blends two fully-transformed mosaic samples
                # (reference augment.py:867; v8_transforms order :2275)
                from bsyolo_tpu.data.augment import mixup

                idxs2 = list(rng.integers(0, len(self), 4))
                imgs2 = [self.load_image(j) for j in idxs2]
                labels2 = [self.label_pixels(j, imgs2[k].shape[:2]) for k, j in enumerate(idxs2)]
                img2, cls2, boxes2 = train_transform(
                    imgs2, labels2, self.imgsz, rng, self.hyp, mosaic=True
                )
                img, cls, boxes = mixup(img, (cls, boxes), img2, (cls2, boxes2), rng)
            if self.hyp.get("bgr", 0.0) and rng.random() < self.hyp.get("bgr", 0.0):
                # once, after mosaic/mixup — the reference Format/bgr position
                img = np.ascontiguousarray(img[..., ::-1])
        else:
            from bsyolo_tpu.ops.letterbox import letterbox_image

            im = self.load_image(i)
            cls, boxes = self.label_pixels(i, im.shape[:2])
            # `shape` (rect-val bucket, build.py RectBuckets) overrides the
            # square canvas; labels normalize against the actual canvas in
            # format_labels, so non-square targets need no extra math
            target = shape or (self.imgsz, self.imgsz)
            img, r, (dw, dh) = letterbox_image(im, target, scaleup=False)
            if len(boxes):
                boxes = boxes * r
                boxes[:, [0, 2]] += dw
                boxes[:, [1, 3]] += dh
        out_img, out_cls, out_box, out_mask = format_labels(img, cls, boxes, self.max_gt)
        return {"img": out_img, "cls": out_cls, "bboxes": out_box, "mask": out_mask}

    # --- point-payload tasks (segment / pose / obb) -------------------------

    POLY_PTS = 1000  # segment resample count (reference dataset.py:204
    # update_labels_info resamples segments to 1000 points before transforms)

    @property
    def nkpt(self) -> int:
        """Dataset-global keypoint count (consistent batch shapes)."""
        if not hasattr(self, "_nkpt"):
            self._nkpt = max(
                (len(k) for kl in self.keypoints.values() for k in kl if k is not None),
                default=1,
            )
        return self._nkpt

    def _task_payload(self, j: int, shape: Tuple[int, int], K: int):
        """(cls, boxes xyxy px, pts (n,K,2) px, vis (n,K)|None) for image j
        at its pre-resized shape — the augment pipeline's label payload."""
        from bsyolo_tpu.data.augment import resample_poly

        h, w = shape
        cls, boxes = self.label_pixels(j, shape)
        n = len(cls)
        wh = np.asarray([w, h], np.float32)
        if self.task == "segment":
            polys = self.segments.get(j, [None] * n)
            pts = np.zeros((n, K, 2), np.float32)
            for t in range(n):
                poly = polys[t] if t < len(polys) else None
                if poly is None:  # box-only row in a mixed file: rect outline
                    x1, y1, x2, y2 = boxes[t]
                    poly = np.asarray(
                        [[x1, y1], [x2, y1], [x2, y2], [x1, y2]], np.float32
                    )
                else:
                    poly = poly * wh
                pts[t] = resample_poly(poly, K)
            return cls, boxes, pts, None
        if self.task == "obb":
            corners = self.rcorners.get(j, [])
            pts = np.zeros((n, 4, 2), np.float32)
            for t in range(n):
                if t < len(corners) and corners[t] is not None:
                    pts[t] = corners[t] * wh
                else:
                    x1, y1, x2, y2 = boxes[t]
                    pts[t] = [[x1, y1], [x2, y1], [x2, y2], [x1, y2]]
            return cls, boxes, pts, None
        # pose
        kl = self.keypoints.get(j, [])
        nk = self.nkpt
        pts = np.zeros((n, nk, 2), np.float32)
        vis = np.zeros((n, nk), np.float32)
        for t in range(n):
            k = kl[t] if t < len(kl) else None
            if k is None:
                continue
            pts[t, : len(k), 0] = k[:, 0] * w
            pts[t, : len(k), 1] = k[:, 1] * h
            vis[t, : len(k)] = k[:, 2]
        return cls, boxes, pts, vis

    def _rasterize_overlap(self, pts: np.ndarray, imgsz: int):
        """Overlap-encoded instance masks at imgsz/mask_ratio from (already
        warped) polygons. Instances sort by rasterized area descending so
        smaller instances overwrite larger ones in overlap regions —
        reference polygons2masks_overlap (data/utils.py) behavior; returns
        (masks (ms,ms) int32 with values rank+1, order) and callers reorder
        cls/boxes by ``order`` like reference Format._format_segments."""
        ms = imgsz // self.mask_ratio
        scale = ms / imgsz
        n = len(pts)
        per = np.zeros((n, ms, ms), np.uint8)
        for t in range(n):
            cv2.fillPoly(per[t], [(np.asarray(pts[t], np.float32) * scale).astype(np.int32)], 1)
        areas = per.reshape(n, -1).sum(-1) if n else np.zeros((0,))
        order = np.argsort(-areas, kind="stable")
        masks = np.zeros((ms, ms), np.int32)
        for rank, idx in enumerate(order):
            masks[per[idx] > 0] = rank + 1
        return masks, order

    def _aug_task_sample(self, i: int, rng: np.random.Generator, mosaic: bool) -> Dict:
        """Full train-time augmentation for segment/pose/obb: mosaic + affine
        with the instance points warped through every geometric stage
        (reference v8_transforms augment.py:2275 — RandomPerspective
        apply_segments/apply_keypoints), masks rasterized POST-warp."""
        from bsyolo_tpu.data.augment import format_labels, mixup_task, train_transform_task

        kind = self.task
        K = self.POLY_PTS if kind == "segment" else 4
        flip_idx = self.flip_idx if kind == "pose" else None
        use_mosaic = mosaic and rng.random() < self.hyp.get("mosaic", 1.0)
        idxs = [i] + (list(rng.integers(0, len(self), 3)) if use_mosaic else [])
        imgs = [self.load_image(j) for j in idxs]
        labels = [self._task_payload(j, imgs[t].shape[:2], K) for t, j in enumerate(idxs)]
        img, cls, boxes, pts, vis = train_transform_task(
            imgs, labels, self.imgsz, rng, self.hyp,
            mosaic=use_mosaic, kind=kind, flip_idx=flip_idx,
        )
        if use_mosaic and rng.random() < self.hyp.get("mixup", 0.0):
            idxs2 = list(rng.integers(0, len(self), 4))
            imgs2 = [self.load_image(j) for j in idxs2]
            labels2 = [self._task_payload(j, imgs2[t].shape[:2], K) for t, j in enumerate(idxs2)]
            img2, cls2, boxes2, pts2, vis2 = train_transform_task(
                imgs2, labels2, self.imgsz, rng, self.hyp,
                mosaic=True, kind=kind, flip_idx=flip_idx,
            )
            img, cls, boxes, pts, vis = mixup_task(
                img, (cls, boxes, pts, vis), img2, (cls2, boxes2, pts2, vis2), rng
            )
        if self.hyp.get("bgr", 0.0) and rng.random() < self.hyp.get("bgr", 0.0):
            img = np.ascontiguousarray(img[..., ::-1])
        # truncate to max_gt BEFORE per-task encoding so mask indices /
        # keypoint rows line up with the padded label slots
        cls, boxes, pts = cls[: self.max_gt], boxes[: self.max_gt], pts[: self.max_gt]
        vis = None if vis is None else vis[: self.max_gt]
        out: Dict = {}
        if kind == "segment":
            masks, order = self._rasterize_overlap(pts, self.imgsz)
            cls, boxes = cls[order], boxes[order]
            out["masks"] = masks
        elif kind == "pose":
            nk = pts.shape[1]
            out_kpts = np.zeros((self.max_gt, nk, 3), np.float32)
            if len(pts):
                out_kpts[: len(pts), :, 0] = pts[..., 0] / self.imgsz
                out_kpts[: len(pts), :, 1] = pts[..., 1] / self.imgsz
                out_kpts[: len(pts), :, 2] = vis
            out["keypoints"] = out_kpts
        else:  # obb: fit xywhr on the warped corners (reference Format
            # return_obb -> xyxyxyxy2xywhr, augment.py:2062)
            out_rb = np.zeros((self.max_gt, 5), np.float32)
            for t in range(len(pts)):
                rb = _rbox_from_corners(pts[t])
                out_rb[t] = [rb[0] / self.imgsz, rb[1] / self.imgsz,
                             rb[2] / self.imgsz, rb[3] / self.imgsz, rb[4]]
            out["rboxes"] = out_rb
        out_img, out_cls, out_box, out_mask = format_labels(img, cls, boxes, self.max_gt)
        out.update({"img": out_img, "cls": out_cls, "bboxes": out_box, "mask": out_mask})
        return out

    def _get_pose_sample(self, i: int, rng: np.random.Generator, mosaic: bool = True,
                         shape: Optional[Tuple[int, int]] = None) -> Dict:
        """Pose sample. Train: full mosaic/affine pipeline with keypoints
        warped through (reference apply_keypoints). Val: letterbox only."""
        from bsyolo_tpu.data.augment import format_labels
        from bsyolo_tpu.ops.letterbox import letterbox_image

        if self.augment:
            return self._aug_task_sample(i, rng, mosaic)
        im = self.load_image(i)
        h, w = im.shape[:2]
        cls, boxes = self.label_pixels(i, (h, w))
        kpts_list = self.keypoints.get(i, [])
        nkpt = self.nkpt
        target = shape or (self.imgsz, self.imgsz)
        img, r, (dw, dh) = letterbox_image(im, target, scaleup=False)
        th, tw = img.shape[:2]
        if len(boxes):
            boxes = boxes * r
            boxes[:, [0, 2]] += dw
            boxes[:, [1, 3]] += dh
        out_kpts = np.zeros((self.max_gt, nkpt, 3), np.float32)
        for j, k in enumerate(kpts_list[: self.max_gt]):
            if k is None:
                continue
            kk = k.copy()
            kk[:, 0] = (kk[:, 0] * w * r + dw) / tw
            kk[:, 1] = (kk[:, 1] * h * r + dh) / th
            out_kpts[j, : len(kk)] = kk
        out_img, out_cls, out_box, out_mask = format_labels(img, cls, boxes, self.max_gt)
        return {
            "img": out_img,
            "cls": out_cls,
            "bboxes": out_box,
            "mask": out_mask,
            "keypoints": out_kpts,
        }

    def _get_obb_sample(self, i: int, rng: np.random.Generator, mosaic: bool = True,
                        shape: Optional[Tuple[int, int]] = None) -> Dict:
        """OBB sample. Train: mosaic/affine with the 4 corner points warped
        (reference carries OBB as 4-pt segments). Val: letterbox only."""
        from bsyolo_tpu.data.augment import format_labels
        from bsyolo_tpu.ops.letterbox import letterbox_image

        if self.augment:
            return self._aug_task_sample(i, rng, mosaic)
        im = self.load_image(i)
        h, w = im.shape[:2]
        cls, boxes = self.label_pixels(i, (h, w))
        rb_list = self.rboxes.get(i, [])
        target = shape or (self.imgsz, self.imgsz)
        img, r, (dw, dh) = letterbox_image(im, target, scaleup=False)
        th, tw = img.shape[:2]
        if len(boxes):
            boxes = boxes * r
            boxes[:, [0, 2]] += dw
            boxes[:, [1, 3]] += dh
        out_rb = np.zeros((self.max_gt, 5), np.float32)
        for j, rb in enumerate(rb_list[: self.max_gt]):
            if rb is None:  # plain 5-part row in a mixed OBB file: the
                # axis-aligned box at angle 0 (boxes[j] is letterboxed pixels)
                x1, y1, x2, y2 = boxes[j]
                out_rb[j] = [(x1 + x2) / 2 / tw, (y1 + y2) / 2 / th,
                             (x2 - x1) / tw, (y2 - y1) / th, 0.0]
                continue
            # rb is (cx, cy, w, h, r) in normalized source coords
            cx = (rb[0] * w * r + dw) / tw
            cy = (rb[1] * h * r + dh) / th
            bw = rb[2] * w * r / tw
            bh = rb[3] * h * r / th
            out_rb[j] = [cx, cy, bw, bh, rb[4]]
        out_img, out_cls, out_box, out_mask = format_labels(img, cls, boxes, self.max_gt)
        return {
            "img": out_img,
            "cls": out_cls,
            "bboxes": out_box,
            "mask": out_mask,
            "rboxes": out_rb,
        }

    def _get_segment_sample(self, i: int, rng: np.random.Generator, mosaic: bool = True,
                            shape: Optional[Tuple[int, int]] = None) -> Dict:
        """Segmentation sample. Train: full mosaic/affine pipeline with
        polygons warped through (reference apply_segments) and masks
        rasterized post-warp, overlap-encoded at imgsz/mask_ratio
        (reference overlap_mask=True, data/dataset.py + loss.py:455).
        Val: letterbox only."""
        from bsyolo_tpu.data.augment import format_labels
        from bsyolo_tpu.ops.letterbox import letterbox_image

        if self.augment:
            return self._aug_task_sample(i, rng, mosaic)
        im = self.load_image(i)
        h, w = im.shape[:2]
        cls, boxes = self.label_pixels(i, (h, w))
        polys = self.segments.get(i, [None] * len(cls))
        target = shape or (self.imgsz, self.imgsz)
        img, r, (dw, dh) = letterbox_image(im, target, scaleup=False)
        th, tw = img.shape[:2]
        if len(boxes):
            boxes = boxes * r
            boxes[:, [0, 2]] += dw
            boxes[:, [1, 3]] += dh
        n = min(len(cls), self.max_gt)
        pts = []
        for j in range(n):
            poly = polys[j] if j < len(polys) else None
            if poly is None:
                x1, y1, x2, y2 = boxes[j]
                poly = np.asarray([[x1, y1], [x2, y1], [x2, y2], [x1, y2]], np.float32)
            else:
                poly = poly * [w, h] * r
                poly = poly + [dw, dh]
            pts.append(np.asarray(poly, np.float32))
        # NOTE: rasterize on the (th, tw) canvas; _rasterize_overlap assumes a
        # square imgsz, so use max(th, tw) — extra area is padding-only.
        masks, order = self._rasterize_overlap(pts, max(th, tw))
        masks = masks[: th // self.mask_ratio, : tw // self.mask_ratio]
        cls, boxes = (cls[: n][order], boxes[: n][order]) if n else (cls, boxes)
        out_img, out_cls, out_box, out_mask = format_labels(img, cls, boxes, self.max_gt)
        return {
            "img": out_img,
            "cls": out_cls,
            "bboxes": out_box,
            "mask": out_mask,
            "masks": masks,
        }
