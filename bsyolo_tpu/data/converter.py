"""Dataset converters (reference data/converter.py).

coco2yolo: COCO instances JSON -> YOLO txt labels (boxes and optionally
segment polygons), the reference's convert_coco.
"""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path
from typing import Dict, Optional

from bsyolo_tpu.utils import LOGGER

# COCO 91-index -> contiguous 80-class mapping (reference coco91_to_coco80_class)
def coco91_to_coco80() -> Dict[int, int]:
    missing = {12, 26, 29, 30, 45, 66, 68, 69, 71, 83}
    out = {}
    idx = 0
    for i in range(1, 91):
        if i in missing:
            continue
        out[i] = idx
        idx += 1
    return out


def convert_coco(
    annotations_json: str,
    save_dir: str = "yolo_labels",
    use_segments: bool = False,
    cls91to80: bool = True,
) -> Path:
    """Write YOLO-format labels/<image>.txt from a COCO annotation file."""
    save = Path(save_dir) / "labels"
    save.mkdir(parents=True, exist_ok=True)
    data = json.loads(Path(annotations_json).read_text())
    images = {im["id"]: im for im in data["images"]}
    mapping = coco91_to_coco80() if cls91to80 else None

    per_image = defaultdict(list)
    for ann in data["annotations"]:
        if ann.get("iscrowd"):
            continue
        per_image[ann["image_id"]].append(ann)

    n = 0
    for img_id, anns in per_image.items():
        im = images[img_id]
        w, h = im["width"], im["height"]
        lines = []
        for ann in anns:
            cid = ann["category_id"]
            cls = mapping.get(cid, None) if mapping else cid - 1
            if cls is None:
                continue
            if use_segments and ann.get("segmentation"):
                seg = ann["segmentation"]
                if isinstance(seg, list) and seg:
                    poly = seg[0]
                    xs = poly[0::2]
                    ys = poly[1::2]
                    norm = [f"{x / w:.6f} {y / h:.6f}" for x, y in zip(xs, ys)]
                    lines.append(f"{cls} " + " ".join(norm))
                    continue
            x, y, bw, bh = ann["bbox"]
            cx, cy = (x + bw / 2) / w, (y + bh / 2) / h
            lines.append(f"{cls} {cx:.6f} {cy:.6f} {bw / w:.6f} {bh / h:.6f}")
        stem = Path(im["file_name"]).stem
        (save / f"{stem}.txt").write_text("\n".join(lines) + ("\n" if lines else ""))
        n += 1
    LOGGER.info(f"converted {n} images -> {save}")
    return save


def autosplit(path, weights=(0.9, 0.1, 0.0), annotated_only: bool = False, seed: int = 0):
    """Split an images dir into autosplit_{train,val,test}.txt listings
    (reference data/utils.py:620; xView.yaml's split convention).

    Each image is assigned to a split by weighted draw (seeded for
    reproducibility). With ``annotated_only`` images lacking a label txt
    (images/ -> labels/ sibling convention) are skipped.
    """
    import random

    from bsyolo_tpu.utils import LOGGER

    exts = {".jpg", ".jpeg", ".png", ".bmp", ".webp", ".tif", ".tiff"}
    path = Path(path)
    files = sorted(x for x in path.rglob("*.*") if x.suffix.lower() in exts)
    rng = random.Random(seed)
    names = ["autosplit_train.txt", "autosplit_val.txt", "autosplit_test.txt"]
    for n in names:
        (path.parent / n).unlink(missing_ok=True)
    counts = [0, 0, 0]
    from bsyolo_tpu.data.dataset import img2label_path

    for img in files:
        if annotated_only:
            if not Path(img2label_path(str(img))).exists():
                continue
        i = rng.choices([0, 1, 2], weights=weights, k=1)[0]
        with open(path.parent / names[i], "a") as f:
            f.write(f"./{img.relative_to(path.parent).as_posix()}\n")
        counts[i] += 1
    LOGGER.info(f"autosplit {sum(counts)} images -> train/val/test = {counts}")
    return counts
