"""Dataset/run tooling (reference sys/mask2json.py, sys/visionable.py,
sys/训练过程对比曲线.py — the annotation + analysis helpers around the app).

    python examples/tools.py mask2json  mask_dir out_dir [label]
    python examples/tools.py viz-labels images_dir labels_dir out_dir
    python examples/tools.py compare-runs out.png run1/results.csv run2/results.csv ...
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np


def mask2json(mask_dir: str, out_dir: str, label: str = "blindway"):
    """Binary PNG masks -> labelme-style polygon JSON (reference
    sys/mask2json.py:13)."""
    import cv2

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n = 0
    for f in sorted(Path(mask_dir).glob("*.png")):
        m = cv2.imread(str(f), cv2.IMREAD_GRAYSCALE)
        if m is None:
            continue
        cnts, _ = cv2.findContours((m > 127).astype(np.uint8), cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
        shapes = []
        for c in cnts:
            if cv2.contourArea(c) < 16:
                continue
            pts = c.reshape(-1, 2)
            if len(pts) > 100:
                pts = pts[:: -(-len(pts) // 100)]  # ceil step enforces the cap
            shapes.append({
                "label": label,
                "points": pts.astype(float).tolist(),
                "group_id": None,
                "shape_type": "polygon",
                "flags": {},
            })
        doc = {
            "version": "5.0.1", "flags": {}, "shapes": shapes,
            "imagePath": f.with_suffix(".jpg").name, "imageData": None,
            "imageHeight": int(m.shape[0]), "imageWidth": int(m.shape[1]),
        }
        (out / f.with_suffix(".json").name).write_text(json.dumps(doc, indent=2))
        n += 1
    print(f"wrote {n} labelme jsons to {out}")
    return n


def viz_labels(images_dir: str, labels_dir: str, out_dir: str):
    """Draw YOLO txt labels onto their images (reference sys/visionable.py)."""
    import cv2

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    colors = [(56, 56, 255), (31, 112, 255), (29, 178, 255), (49, 210, 207), (23, 204, 146)]
    n = 0
    for f in sorted(Path(images_dir).glob("*")):
        if f.suffix.lower() not in (".jpg", ".jpeg", ".png", ".bmp"):
            continue
        img = cv2.imread(str(f))
        if img is None:
            continue
        h, w = img.shape[:2]
        lb = Path(labels_dir) / f"{f.stem}.txt"
        if lb.exists():
            for line in lb.read_text().splitlines():
                vals = [float(v) for v in line.split()]
                if len(vals) < 5:
                    continue
                c, cx, cy, bw, bh = int(vals[0]), *vals[1:5]
                x1, y1 = int((cx - bw / 2) * w), int((cy - bh / 2) * h)
                x2, y2 = int((cx + bw / 2) * w), int((cy + bh / 2) * h)
                col = colors[c % len(colors)]
                cv2.rectangle(img, (x1, y1), (x2, y2), col, 2)
                cv2.putText(img, str(c), (x1, max(y1 - 4, 10)),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.5, col, 1)
        cv2.imwrite(str(out / f.name), img)
        n += 1
    print(f"annotated {n} images into {out}")
    return n


def compare_runs(out_png: str, *csvs: str):
    """Overlay training curves from results.csv files (reference
    sys/训练过程对比曲线.py)."""
    import csv as _csv

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    for path in csvs:
        rows = list(_csv.reader(Path(path).read_text().splitlines()))
        head = [h.strip() for h in rows[0]]
        data = np.asarray([[float(v) for v in r] for r in rows[1:]])
        name = Path(path).parent.name or Path(path).stem

        def col(*cands):
            for c in cands:
                for i, h in enumerate(head):
                    if c in h:
                        return data[:, i]
            return None

        loss = col("loss")
        m = col("mAP50(B)", "mAP50")
        ep = col("epoch")
        x = ep if ep is not None else np.arange(len(data))
        if loss is not None:
            axes[0].plot(x, loss, label=name)
        if m is not None:
            axes[1].plot(x, m, label=name)
    axes[0].set_title("loss")
    axes[1].set_title("mAP50")
    for ax in axes:
        ax.legend()
        ax.set_xlabel("epoch")
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)
    print(f"saved comparison to {out_png}")
    return out_png


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else ""
    if cmd == "mask2json":
        mask2json(*sys.argv[2:])
    elif cmd == "viz-labels":
        viz_labels(*sys.argv[2:])
    elif cmd == "compare-runs":
        compare_runs(*sys.argv[2:])
    else:
        print(__doc__)
