"""Input-pipeline throughput: can the loader feed the train step?

Measures sustained DataLoader img/s (full mosaic+affine+HSV assembly through
the REAL loader, not per-stage micro-times) across cache modes and worker
counts, then prints the crossover against a recorded device consumption rate
(the train step's img/s from bench_train.py).

Usage:
    python examples/bench_loader.py [BENCH_IMGSZ=640] [BENCH_BATCH=16]
        [TRAIN_IMG_S=898] [BENCH_NIMG=128] [BENCH_WORKERS=0,1,2,4]

The dataset is synthesized on first run (realistic 1280x960 q85 JPEGs with
boxes; decode cost matches COCO-scale photos) under /tmp/bench_loader_ds.
Counterpart of reference build.py:28 InfiniteDataLoader's feeding job; the
reference never benches it — feeding is the canonical silent training
bottleneck, so this prints one honest number per configuration.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

IMGSZ = int(os.environ.get("BENCH_IMGSZ", 640))
BATCH = int(os.environ.get("BENCH_BATCH", 16))
TRAIN_IMG_S = float(os.environ.get("TRAIN_IMG_S", 898.0))
N_IMG = int(os.environ.get("BENCH_NIMG", 128))
WORKER_SET = [int(w) for w in os.environ.get("BENCH_WORKERS", "0").split(",")]

HYP = {
    "mosaic": 1.0, "mixup": 0.0, "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
    "degrees": 0.0, "translate": 0.1, "scale": 0.5, "shear": 0.0,
    "perspective": 0.0, "fliplr": 0.5, "flipud": 0.0,
}


def make_dataset(root: Path, n: int = 128) -> Path:
    import cv2

    if (root / "done").exists():
        return root / "images" / "train"
    rng = np.random.default_rng(0)
    (root / "images" / "train").mkdir(parents=True, exist_ok=True)
    (root / "labels" / "train").mkdir(parents=True, exist_ok=True)
    for i in range(n):
        img = rng.integers(0, 255, (960, 1280, 3)).astype(np.uint8)
        img = cv2.GaussianBlur(img, (0, 0), 3)
        lines = []
        for _ in range(8):
            w = int(rng.integers(60, 200))
            x0 = int(rng.integers(0, 1280 - w))
            y0 = int(rng.integers(0, 960 - w))
            cv2.rectangle(img, (x0, y0), (x0 + w, y0 + w), (230, 220, 210), -1)
            lines.append(
                f"0 {(x0 + w / 2) / 1280:.6f} {(y0 + w / 2) / 960:.6f} "
                f"{w / 1280:.6f} {w / 960:.6f}"
            )
        cv2.imwrite(str(root / "images" / "train" / f"{i:04d}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 85])
        (root / "labels" / "train" / f"{i:04d}.txt").write_text("\n".join(lines))
    (root / "done").touch()
    return root / "images" / "train"


def bench_one(img_dir: Path, cache, workers: int) -> float:
    from bsyolo_tpu.data.build import DataLoader
    from bsyolo_tpu.data.dataset import YOLODataset

    ds = YOLODataset(str(img_dir), imgsz=IMGSZ, augment=True, hyp=dict(HYP), cache=cache)
    loader = DataLoader(ds, BATCH, workers=workers, seed=0)
    # warm epoch: populates the disk cache / forks the pool / warms page cache
    for _ in loader:
        pass
    n = 0
    loader.set_epoch(1)
    t0 = time.perf_counter()
    for batch in loader:
        n += len(batch["img"])
    dt = time.perf_counter() - t0
    loader.close()
    return n / dt


def main(record: str | None = None):
    try:
        cores = len(os.sched_getaffinity(0))
    except AttributeError:
        cores = os.cpu_count() or 1
    img_dir = make_dataset(Path("/tmp/bench_loader_ds"), N_IMG)
    print(f"# host cores={cores} imgsz={IMGSZ} batch={BATCH} n_img={N_IMG} "
          f"(mosaic+affine+HSV+flip, uint8 batches)")
    rows = []
    for cache in (None, "disk", "ram"):
        for w in WORKER_SET:
            rate = bench_one(img_dir, cache, w)
            rows.append((cache or "none", w, rate))
            need = TRAIN_IMG_S / rate
            print(f"cache={cache or 'none':<5} workers={w}: {rate:6.1f} img/s "
                  f"-> {need:5.1f} cores to feed {TRAIN_IMG_S:.0f} img/s/chip")
    best = max(rows, key=lambda r: r[2])
    print(
        f'{{"metric": "loader throughput (cache={best[0]}, workers={best[1]}, '
        f'{cores}-core host)", "value": {best[2]:.1f}, "unit": "img/s", '
        f'"cores_to_feed_{TRAIN_IMG_S:.0f}": {TRAIN_IMG_S / best[2]:.1f}}}'
    )
    if record is not None:
        # host-qualification artifact (VERDICT r4 #8): one command on any
        # real host settles the "can N cores feed the chip" question —
        # cores, per-config rates, the device rate compared against, verdict
        import json
        import platform

        art = {
            "host": platform.node(),
            "cores": cores,
            "imgsz": IMGSZ,
            "batch": BATCH,
            "n_images": N_IMG,
            "device_img_s": TRAIN_IMG_S,
            "rows": [
                {"cache": c, "workers": w, "img_s": round(r, 1),
                 "cores_to_feed_device": round(TRAIN_IMG_S / r, 1)}
                for c, w, r in rows
            ],
            "best": {"cache": best[0], "workers": best[1], "img_s": round(best[2], 1)},
            "feed_ratio": round(best[2] / TRAIN_IMG_S, 3),
            "verdict": "feeds" if best[2] >= TRAIN_IMG_S else "underfeeds",
        }
        path = Path(record if record is not True and record != "" else
                    "loader_qualification.json")
        path.write_text(json.dumps(art, indent=2) + "\n")
        print(f"# wrote {path}")


if __name__ == "__main__":
    rec = None
    if "--record" in sys.argv:
        i = sys.argv.index("--record")
        rec = sys.argv[i + 1] if len(sys.argv) > i + 1 and not sys.argv[i + 1].startswith("-") else ""
    main(record=rec)
