"""Measure the validator's software pipeline win (round 5, VERDICT r4 #4).

engine/validator.py dispatches batch k+1's forward before batch k's result
is read, overlapping host-side metric matching with device compute. This
script times the SAME full validation pass (real DetectionValidator: NMS
decode, per-image matching at 10 IoUs, metric accumulation) with the
pipeline on vs the synchronous dispatch-read loop (BSYOLO_VAL_SYNC=1).

Wall-clock protocol: one compiled+warmed validator pass per mode, best of
3 timed passes. Unlike the scan-diff microbenches this is an END-TO-END
host+device+relay number — that is the quantity pipelining improves.

Usage: [BENCH_SCALE=n] [BENCH_BATCH=16] [BENCH_IMGSZ=640] python examples/bench_val_pipeline.py
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bench_loader import make_dataset  # 128 synthetic COCO-photo-scale JPEGs


def main():
    import jax.numpy as jnp

    from bsyolo_tpu.cfg import model_yaml_path
    from bsyolo_tpu.data import DataLoader, YOLODataset
    from bsyolo_tpu.engine.validator import DetectionValidator
    from bsyolo_tpu.nn import build_model, load_model_yaml, parse_model_yaml

    imgsz = int(os.environ.get("BENCH_IMGSZ", 640))
    scale = os.environ.get("BENCH_SCALE", "n")
    batch = int(os.environ.get("BENCH_BATCH", 16))

    img_dir = make_dataset(Path("/tmp/bench_loader_ds"), 128)
    ds = YOLODataset(str(img_dir), imgsz=imgsz, augment=False, max_gt=32)
    loader = DataLoader(ds, batch, shuffle=False, drop_last=False)

    d = load_model_yaml(model_yaml_path("yolo11.yaml"))
    d["nc"] = 1
    spec = parse_model_yaml(d, scale=scale)
    model, variables = build_model(spec, img_size=imgsz, dtype=jnp.bfloat16)
    vd = DetectionValidator(model, spec, names={0: "box"})

    n_img = len(ds)
    for mode, env in (("pipelined", None), ("synchronous", "1")):
        if env is None:
            os.environ.pop("BSYOLO_VAL_SYNC", None)
        else:
            os.environ["BSYOLO_VAL_SYNC"] = env
        vd(variables, loader, verbose=False)  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            vd(variables, loader, verbose=False)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "metric": f"full val pass {mode} (yolo11{scale} @{imgsz}, "
            f"batch={batch}, {n_img} imgs, e2e wall incl NMS+matching)",
            "value": round(n_img / best, 1),
            "unit": "images/sec",
            "wall_s": round(best, 3),
        }))


if __name__ == "__main__":
    main()
