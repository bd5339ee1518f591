"""Auto-annotation: detector boxes -> SAM mask polygons
(reference data/annotator.py auto_annotate).

Runs the YOLO detector over a folder, prompts SAM with the resulting boxes,
and writes YOLO-segment label files (class + normalized polygon points).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence


def _mask_to_polygon(mask, max_points: int = 64):
    """Largest external contour of a bool mask -> (n, 2) float array."""
    import cv2
    import numpy as np

    cnts, _ = cv2.findContours(mask.astype("uint8"), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    if not cnts:
        return None
    c = max(cnts, key=cv2.contourArea).reshape(-1, 2).astype(np.float32)
    if len(c) > max_points:
        c = c[:: max(1, len(c) // max_points)][:max_points]
    return c if len(c) >= 3 else None


def auto_annotate(
    data: str,
    det_model: str = "yolo11n.yaml",
    sam_model: str = "sam_b.pt",
    conf: float = 0.25,
    iou: float = 0.45,
    imgsz: int = 640,
    max_det: int = 300,
    classes: Optional[Sequence[int]] = None,
    output_dir: Optional[str] = None,
    det=None,
    sam=None,
):
    """Annotate every image under ``data`` with detector+SAM labels.

    ``det``/``sam`` accept pre-built model facades (so tests or callers with
    converted weights can inject them); otherwise they are constructed from
    ``det_model``/``sam_model`` names like the reference.
    """
    import cv2
    import numpy as np

    from bsyolo_tpu.model import YOLO
    from bsyolo_tpu.models.sam import SAM

    det = det or YOLO(det_model)
    sam = sam or SAM(sam_model)

    data = Path(data)
    out = Path(output_dir or data.parent / f"{data.stem}_auto_annotate_labels")
    out.mkdir(parents=True, exist_ok=True)

    n_labeled = 0
    for im_file in sorted(data.glob("*")):
        img = cv2.imread(str(im_file))
        if img is None:
            continue
        img = img[..., ::-1]
        h, w = img.shape[:2]
        r = det.predict([img], conf=conf, iou=iou, imgsz=imgsz, max_det=max_det)[0]
        if r.boxes is None or len(r.boxes.data) == 0:
            continue
        boxes = r.boxes.data
        keep = boxes[:, 4] > 0
        if classes is not None:
            keep &= np.isin(boxes[:, 5].astype(int), list(classes))
        boxes = boxes[keep]
        if len(boxes) == 0:
            continue
        seg = sam(img, bboxes=boxes[:, :4].tolist())[0]
        lines = []
        for cls_id, mask in zip(boxes[:, 5].astype(int), seg.masks.data):
            poly = _mask_to_polygon(mask > 0.5)
            if poly is None:
                continue
            pts = poly / np.asarray([w, h], np.float32)
            lines.append(f"{cls_id} " + " ".join(f"{v:.6g}" for v in pts.reshape(-1)))
        if lines:
            (out / f"{im_file.stem}.txt").write_text("\n".join(lines) + "\n")
            n_labeled += 1
    return n_labeled
