"""Plotting utilities (reference utils/plotting.py).

- plot_results: training-curve grid from results.csv (reference :1176)
- plot_images: annotated train-batch mosaics (reference :1008)
- plot_labels: dataset label statistics
All matplotlib/cv2 on host.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np


def plot_results(csv_path, save_path: Optional[str] = None):
    """Grid of loss/metric curves from a results.csv."""
    import csv as _csv

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = list(_csv.DictReader(open(csv_path)))
    if not rows:
        return None
    keys = [k for k in rows[0] if k != "epoch"]
    epochs = [int(r["epoch"]) for r in rows]
    n = len(keys)
    ncols = min(4, n)
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 3 * nrows), squeeze=False)
    for i, k in enumerate(keys):
        ax = axes[i // ncols][i % ncols]
        vals = [float(r[k] or 0) for r in rows]
        ax.plot(epochs, vals, marker=".")
        ax.set_title(k, fontsize=9)
        ax.grid(alpha=0.3)
    for j in range(n, nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    fig.tight_layout()
    out = Path(save_path or Path(csv_path).with_name("results.png"))
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return str(out)


def plot_images(
    batch: Dict[str, np.ndarray],
    names: Optional[Dict[int, str]] = None,
    max_images: int = 16,
    save_path: Optional[str] = None,
):
    """Tile a training batch with its boxes drawn (train-batch mosaic)."""
    import cv2

    imgs = batch["img"][:max_images]
    n = len(imgs)
    cols = int(np.ceil(np.sqrt(n)))
    rows = (n + cols - 1) // cols
    h, w = imgs.shape[1:3]
    canvas = np.full((rows * h, cols * w, 3), 255, np.uint8)
    for i in range(n):
        im = imgs[i, ..., ::-1]  # RGB -> BGR
        im = im.astype(np.uint8).copy() if im.dtype == np.uint8 else (im * 255).astype(np.uint8)
        mask = batch["mask"][i] > 0
        boxes = batch["bboxes"][i][mask]
        clss = batch["cls"][i][mask]
        for b, c in zip(boxes, clss):
            cx, cy, bw, bh = b * [w, h, w, h]
            p1 = (int(cx - bw / 2), int(cy - bh / 2))
            p2 = (int(cx + bw / 2), int(cy + bh / 2))
            cv2.rectangle(im, p1, p2, (0, 255, 0), 1)
            label = names.get(int(c), str(int(c))) if names else str(int(c))
            cv2.putText(im, label, (p1[0], max(p1[1] - 2, 8)), cv2.FONT_HERSHEY_SIMPLEX, 0.3, (0, 255, 0), 1)
        r, c = i // cols, i % cols
        canvas[r * h : (r + 1) * h, c * w : (c + 1) * w] = im
    if save_path:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(save_path), canvas)
    return canvas


def plot_confusion_matrix(matrix: np.ndarray, names: Dict[int, str], save_path: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = matrix.shape[0]
    fig, ax = plt.subplots(figsize=(max(6, n // 2), max(5, n // 2)))
    im = ax.imshow(matrix / (matrix.sum(0, keepdims=True) + 1e-9), cmap="Blues", vmin=0, vmax=1)
    labels = [names.get(i, str(i)) for i in range(n - 1)] + ["background"]
    ax.set_xticks(range(n), labels, rotation=90, fontsize=7)
    ax.set_yticks(range(n), labels, fontsize=7)
    ax.set_xlabel("True")
    ax.set_ylabel("Predicted")
    fig.colorbar(im)
    fig.tight_layout()
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_path, dpi=120)
    plt.close(fig)
    return save_path


def plot_pr_curve(x: np.ndarray, prec_values: np.ndarray, ap50: np.ndarray,
                  names: Dict[int, str], save_path: str):
    """Per-class precision-recall curves + the all-class mean (reference
    utils/metrics.py plot_pr_curve, written by val when plots=True)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 6))
    prec_values = np.atleast_2d(prec_values)
    if prec_values.size:
        if prec_values.shape[0] <= 21:
            for i, y in enumerate(prec_values):
                label = f"{names.get(i, i)} {ap50[i]:.3f}" if i < len(ap50) else str(i)
                ax.plot(x, y, linewidth=1, label=label)
        else:
            ax.plot(x, prec_values.T, linewidth=1, color="grey")
        ax.plot(x, prec_values.mean(0), linewidth=3, color="blue",
                label=f"all classes {float(np.mean(ap50)) if len(ap50) else 0:.3f} mAP@0.5")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(fontsize=7, loc="lower left")
    fig.tight_layout()
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_path, dpi=120)
    plt.close(fig)
    return save_path


def plot_mc_curve(x: np.ndarray, ys: np.ndarray, names: Dict[int, str],
                  save_path: str, ylabel: str = "Metric"):
    """Metric-vs-confidence curves (reference plot_mc_curve: P/R/F1 pngs)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 6))
    ys = np.atleast_2d(ys)
    if ys.size:
        if ys.shape[0] <= 21:
            for i, y in enumerate(ys):
                ax.plot(x, y, linewidth=1, label=str(names.get(i, i)))
        else:
            ax.plot(x, ys.T, linewidth=1, color="grey")
        m = ys.mean(0)
        ax.plot(x, m, linewidth=3, color="blue",
                label=f"all classes {m.max():.2f} at {x[m.argmax()]:.3f}")
    ax.set_xlabel("Confidence")
    ax.set_ylabel(ylabel)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(fontsize=7, loc="lower left")
    fig.tight_layout()
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_path, dpi=120)
    plt.close(fig)
    return save_path
