"""COCO-format prediction serialization + JSON-protocol evaluation
(reference models/yolo/detect/val.py:281 pred_to_json / :297 eval_json).

``pred_to_json``/``save_predictions_json`` write the standard COCO results
format. ``evaluate_json`` scores predictions.json against an annotation
json with pycocotools when installed, else with a self-contained evaluator
built on this repo's 101-point AP machinery (utils/metrics.py) — same
protocol (per-image greedy matching at IoU .50:.95), no dependency.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

# COCO paper class ids are sparse 1..90; model outputs are dense 0..79
# (reference utils/ops.py coco80_to_coco91_class)
COCO80_TO_COCO91 = [
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22,
    23, 24, 25, 27, 28, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44,
    46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61, 62, 63, 64,
    65, 67, 70, 72, 73, 74, 75, 76, 77, 78, 79, 80, 81, 82, 84, 85, 86, 87, 88,
    89, 90,
]


def pred_to_json(dets: np.ndarray, filename: str, class_map: Optional[List[int]] = None) -> List[Dict]:
    """(n, 6) xyxy/conf/cls dets for one image -> COCO result dicts
    (reference val.py:281)."""
    stem = Path(filename).stem
    image_id = int(stem) if stem.isnumeric() else stem
    out = []
    for x1, y1, x2, y2, conf, cls in np.asarray(dets, np.float64):
        if conf <= 0:
            continue
        c = int(cls)
        out.append(
            {
                "image_id": image_id,
                "category_id": class_map[c] if class_map else c,
                "bbox": [round(x1, 3), round(y1, 3), round(x2 - x1, 3), round(y2 - y1, 3)],
                "score": round(float(conf), 5),
            }
        )
    return out


def encode_rle(mask: np.ndarray) -> Dict:
    """Binary (H, W) mask -> COCO compressed RLE, self-contained.

    Byte-identical to pycocotools.mask.encode (maskApi.c rleEncode +
    rleToString): column-major run lengths starting with the zero run,
    delta-coded from the 3rd count on, packed 5 bits per ASCII char
    (offset 48, bit 0x20 = continuation). No pycocotools needed — the
    reference's segment-val pred_to_json dependency
    (reference models/yolo/segment/val.py) rebuilt offline.
    """
    h, w = mask.shape
    pixels = np.asarray(mask, np.uint8).flatten(order="F")
    # run-length: boundaries where the value changes
    change = np.flatnonzero(pixels[1:] != pixels[:-1]) + 1
    idx = np.concatenate([[0], change, [pixels.size]])
    counts = np.diff(idx).tolist()
    if pixels.size and pixels[0] == 1:
        counts = [0] + counts  # counts always start with a zero-run
    if not pixels.size:
        counts = [0]
    s = []
    for i, c in enumerate(counts):
        x = int(c)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            ch = x & 0x1F
            x >>= 5  # Python >> is arithmetic, matching C signed shift
            more = (x != -1) if (ch & 0x10) else (x != 0)
            if more:
                ch |= 0x20
            s.append(chr(ch + 48))
    return {"size": [int(h), int(w)], "counts": "".join(s)}


def decode_rle(rle: Dict) -> np.ndarray:
    """COCO compressed RLE -> binary (H, W) uint8 mask (maskApi.c rleFrString)."""
    h, w = rle["size"]
    s = rle["counts"]
    if isinstance(s, bytes):
        s = s.decode("ascii")
    counts: List[int] = []
    p = 0
    while p < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[p]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    vals = np.zeros(sum(counts), np.uint8)
    pos = 0
    v = 0
    for c in counts:
        vals[pos : pos + c] = v
        pos += c
        v = 1 - v
    return vals.reshape((w, h)).T  # column-major


def rle_iou(a: Dict, b: Dict) -> float:
    """IoU of two RLE masks (decode-based; fine at test scale)."""
    ma, mb = decode_rle(a).astype(bool), decode_rle(b).astype(bool)
    inter = np.logical_and(ma, mb).sum()
    union = np.logical_or(ma, mb).sum()
    return float(inter) / float(union) if union else 0.0


def seg_pred_to_json(
    dets: np.ndarray,
    masks: np.ndarray,
    filename: str,
    class_map: Optional[List[int]] = None,
) -> List[Dict]:
    """(n, 6) dets + (n, H0, W0) binary masks -> COCO segm results with
    self-contained RLE (reference models/yolo/segment/val.py pred_to_json)."""
    out = pred_to_json(dets, filename, class_map=class_map)
    kept = [i for i, d in enumerate(np.asarray(dets, np.float64)) if d[4] > 0]
    for rec, i in zip(out, kept):
        rec["segmentation"] = encode_rle(np.asarray(masks[i]) > 0.5)
    return out


def pose_pred_to_json(
    dets: np.ndarray,
    kpts: np.ndarray,
    filename: str,
    class_map: Optional[List[int]] = None,
) -> List[Dict]:
    """(n, 6) dets + (n, K, 2|3) keypoints (original-image pixels) -> COCO
    keypoint results (reference models/yolo/pose/val.py pred_to_json)."""
    out = pred_to_json(dets, filename, class_map=class_map)
    kept = [i for i, d in enumerate(np.asarray(dets, np.float64)) if d[4] > 0]
    for rec, i in zip(out, kept):
        k = np.asarray(kpts[i], np.float64)
        if k.shape[-1] == 2:  # visibility defaults to 2 (labeled, visible)
            k = np.concatenate([k, np.full((*k.shape[:-1], 1), 2.0)], axis=-1)
        rec["keypoints"] = [round(float(v), 3) for v in k.reshape(-1)]
    return out


def save_predictions_json(jdict: List[Dict], path: str) -> str:
    Path(path).write_text(json.dumps(jdict))
    return str(path)


def _box_iou_xywh(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(M, 4) x (N, 4) COCO xywh boxes -> (M, N) IoU."""
    ax1, ay1 = a[:, 0], a[:, 1]
    ax2, ay2 = a[:, 0] + a[:, 2], a[:, 1] + a[:, 3]
    bx1, by1 = b[:, 0], b[:, 1]
    bx2, by2 = b[:, 0] + b[:, 2], b[:, 1] + b[:, 3]
    iw = np.minimum(ax2[:, None], bx2[None]) - np.maximum(ax1[:, None], bx1[None])
    ih = np.minimum(ay2[:, None], by2[None]) - np.maximum(ay1[:, None], by1[None])
    inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
    ua = (a[:, 2] * a[:, 3])[:, None] + (b[:, 2] * b[:, 3])[None] - inter
    return np.where(ua > 0, inter / ua, 0.0)


def evaluate_json(anno_json: str, pred_json: str, verbose: bool = True) -> Dict[str, float]:
    """mAP50-95 / mAP50 from COCO-format files (reference eval_json).

    Uses pycocotools when available; otherwise the built-in evaluator (same
    matching protocol, 101-point AP)."""
    try:
        from pycocotools.coco import COCO
        from pycocotools.cocoeval import COCOeval

        anno = COCO(str(anno_json))
        pred = anno.loadRes(str(pred_json))
        ev = COCOeval(anno, pred, "bbox")
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
        return {"mAP50-95": float(ev.stats[0]), "mAP50": float(ev.stats[1])}
    except ImportError:
        pass

    from bsyolo_tpu.utils.metrics import ap_per_class, match_predictions

    anno = json.loads(Path(anno_json).read_text())
    preds = json.loads(Path(pred_json).read_text())
    gt_by_img: Dict = {}
    for a in anno["annotations"] if isinstance(anno, dict) else anno:
        gt_by_img.setdefault(a["image_id"], []).append(a)
    pr_by_img: Dict = {}
    for p in preds:
        pr_by_img.setdefault(p["image_id"], []).append(p)

    iouv = np.linspace(0.5, 0.95, 10)
    tps, confs, pcls, tcls = [], [], [], []
    for img_id in set(gt_by_img) | set(pr_by_img):
        gts = gt_by_img.get(img_id, [])
        prs = sorted(pr_by_img.get(img_id, []), key=lambda p: -p["score"])
        gt_boxes = np.asarray([g["bbox"] for g in gts], np.float64).reshape(-1, 4)
        gt_cls = np.asarray([g["category_id"] for g in gts], np.float64)
        pr_boxes = np.asarray([p["bbox"] for p in prs], np.float64).reshape(-1, 4)
        pr_cls = np.asarray([p["category_id"] for p in prs], np.float64)
        pr_conf = np.asarray([p["score"] for p in prs], np.float64)
        tcls.append(gt_cls)
        if len(prs) == 0:
            continue
        iou = _box_iou_xywh(gt_boxes, pr_boxes) if len(gts) else np.zeros((0, len(prs)))
        tp = match_predictions(pr_cls, gt_cls, iou, iouv)
        tps.append(tp)
        confs.append(pr_conf)
        pcls.append(pr_cls)
    if not tps:
        return {"mAP50-95": 0.0, "mAP50": 0.0}
    tp = np.concatenate(tps)
    conf = np.concatenate(confs)
    pc = np.concatenate(pcls)
    tc = np.concatenate(tcls) if tcls else np.zeros(0)
    res = ap_per_class(tp, conf, pc, tc)
    ap = res[5]  # (nc, T)
    out = {"mAP50-95": float(ap.mean()), "mAP50": float(ap[:, 0].mean())}
    if verbose:
        print(f"COCO-json eval (built-in): mAP50-95 {out['mAP50-95']:.4f}  mAP50 {out['mAP50']:.4f}")
    return out


def obb_pred_to_json(dets: np.ndarray, filename: str, class_map: Optional[List[int]] = None) -> List[Dict]:
    """(n, 7) xywh/conf/cls/angle rotated dets for one image -> COCO-style
    dicts carrying both `rbox` (cx,cy,w,h,r) and `poly` (8 corner coords)
    fields (reference models/yolo/obb/val.py:114-129 pred_to_json)."""
    import jax.numpy as jnp

    from bsyolo_tpu.ops.obb import xywhr2xyxyxyxy

    stem = Path(filename).stem
    image_id = int(stem) if stem.isnumeric() else stem
    out: List[Dict] = []
    d = np.asarray(dets, np.float64)
    if not len(d):
        return out
    rbox = np.concatenate([d[:, :4], d[:, 6:7]], -1)
    poly = np.asarray(xywhr2xyxyxyxy(jnp.asarray(rbox))).reshape(len(d), 8)
    for i, row in enumerate(d):
        if row[4] <= 0:
            continue
        c = int(row[5])
        out.append(
            {
                "image_id": image_id,
                "category_id": class_map[c] if class_map else c,
                "score": round(float(row[4]), 5),
                "rbox": [round(float(x), 3) for x in rbox[i]],
                "poly": [round(float(x), 3) for x in poly[i]],
            }
        )
    return out
