"""Predictor throughput on real sources (VERDICT r2 #5: publish the number).

Measures the full DetectionPredictor path — JPEG/video decode + letterbox on
the host (producer thread), batched device forward+decode+NMS (double-
buffered dispatch), per-frame Results emission — over

  dir:   N JPEG files (the bsyolo8 fixture tiled into a tmp dir)
  video: an mp4 synthesized from the same frames

This is wall-clock over the second (compiled) pass, so it includes every
host cost bench.py's device-only scan-diff excludes; on a 1-core host the
decode+letterbox producer is the expected bottleneck, and the gap between
this number and bench.py's device img/s is the host/device imbalance, not
framework overhead. Results.speed averages split the stages.

Usage: [BENCH_IMGSZ=640] [BENCH_BATCH=32] [BENCH_N=256] python examples/bench_predictor.py
"""

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = Path(__file__).parent.parent / "tests" / "fixtures" / "bsyolo8" / "images" / "train"


def make_dir(root: Path, n: int) -> Path:
    d = root / "imgs"
    d.mkdir()
    srcs = sorted(FIXTURE.glob("*.jpg"))
    for i in range(n):
        shutil.copy(srcs[i % len(srcs)], d / f"{i:05d}.jpg")
    return d


def make_video(root: Path, n: int, fps: int = 30) -> Path:
    import cv2

    srcs = [cv2.imread(str(p)) for p in sorted(FIXTURE.glob("*.jpg"))]
    h, w = srcs[0].shape[:2]
    path = root / "clip.mp4"
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for i in range(n):
        vw.write(srcs[i % len(srcs)])
    vw.release()
    return path


def run(model, source, label, imgsz, batch):
    # pass 1 compiles + warms the producer; pass 2 is the measurement
    for r in model.predict(source, imgsz=imgsz, conf=0.25, batch=batch, stream=True):
        pass
    t0 = time.perf_counter()
    n, pre, inf, post = 0, 0.0, 0.0, 0.0
    for r in model.predict(source, imgsz=imgsz, conf=0.25, batch=batch, stream=True):
        n += 1
        pre += r.speed["preprocess"]
        inf += r.speed["inference"]
        post += r.speed["postprocess"]
    dt = time.perf_counter() - t0
    out = {
        "metric": f"predictor {label} e2e throughput @{imgsz} (decode+letterbox+fwd+NMS+emit)",
        "value": round(n / dt, 1),
        "unit": "images/sec",
        "frames": n,
        "avg_ms": {
            "preprocess": round(pre / n, 2),
            "inference": round(inf / n, 2),
            "postprocess": round(post / n, 2),
        },
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    from bsyolo_tpu import YOLO

    imgsz = int(os.environ.get("BENCH_IMGSZ", 640))
    batch = int(os.environ.get("BENCH_BATCH", 32))
    n = int(os.environ.get("BENCH_N", 256))

    model = YOLO("bsyolo_tpu/cfg/models/11/yolo11.yaml")

    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        run(model, str(make_dir(root, n)), f"dir[{n} jpg]", imgsz, batch)
        run(model, str(make_video(root, n)), f"video[{n} frames]", imgsz, batch)


if __name__ == "__main__":
    main()
