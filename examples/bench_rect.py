"""Rect-val canvas bench: device e2e time on the three static aspect buckets.

docs/performance.md's rect-val section argues (analytically) that the
480x640 wide canvas computes 75% of the square canvas's pixels, so val
throughput on wide-aspect images should approach 1.33x. This script MEASURES
the per-canvas device e2e rate (forward + XLA-fused decode + NMS — the same
compiled program `val(rect=True)` runs per bucket, engine/validator.py) with
bench.py's relay-safe scan-diff protocol.

Usage: [BENCH_SCALE=n] [BENCH_BATCH=128] [BENCH_IMGSZ=640] python examples/bench_rect.py
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from bench import _require_device

    _require_device(int(os.environ.get("BENCH_DEVICE_TIMEOUT", 600)))

    import jax
    import jax.numpy as jnp

    from bsyolo_tpu.cfg import model_yaml_path
    from bsyolo_tpu.kernels.postprocess import detect_postprocess
    from bsyolo_tpu.nn import build_model, load_model_yaml, parse_model_yaml
    from bsyolo_tpu.nn.model import cast_inference_params

    scale = os.environ.get("BENCH_SCALE", "n")
    bs = int(os.environ.get("BENCH_BATCH", 128))
    imgsz = int(os.environ.get("BENCH_IMGSZ", 640))
    # validator's stride-snapped short side (mirror data/build.py rect buckets,
    # including the >=32 floor)
    short = max(32, int(imgsz * 0.75 / 32) * 32)

    d = load_model_yaml(model_yaml_path("yolo11.yaml"))
    d["nc"] = 80
    spec = parse_model_yaml(d, scale=scale)
    model, variables = build_model(spec, img_size=imgsz, dtype=jnp.bfloat16)
    variables = cast_inference_params(variables)

    def predict(variables, x):
        feats = model.apply(variables, x, train=False)
        return detect_postprocess(
            feats, spec.head_strides, spec.nc,
            conf_thres=0.25, iou_thres=0.7, max_det=300, pre_k=512,
        )

    @partial(jax.jit, static_argnames=("n",))
    def predict_loop(variables, x, n):
        def body(carry, i):
            xx, acc = carry
            out = predict(variables, xx + (i * 1e-6).astype(x.dtype))
            return (x + (out[0, 0, 0] * 1e-9).astype(x.dtype), acc + jnp.sum(out)), None

        (_, acc), _ = jax.lax.scan(body, (x, jnp.float32(0)), jnp.arange(n, dtype=jnp.float32))
        return acc

    def scan_diff(h, w, n1=2, n2=12):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(0, 1, (bs, h, w, 3)).astype(np.float32)).astype(jnp.bfloat16)
        times = {}
        for n in (n1, n2):
            float(predict_loop(variables, x, n))  # compile + warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(predict_loop(variables, x, n))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
            print(f"# {h}x{w} scan n={n}: {best*1000:.1f} ms", file=sys.stderr, flush=True)
        per_iter = (times[n2] - times[n1]) / (n2 - n1)
        return bs / per_iter

    # the validator's three stride-snapped canvases for imgsz=640
    rates = {}
    for h, w in ((imgsz, imgsz), (short, imgsz), (imgsz, short)):
        rates[f"{h}x{w}"] = scan_diff(h, w)

    square = rates[f"{imgsz}x{imgsz}"]
    print(json.dumps({
        "metric": f"rect-val canvas device e2e rate (yolo11{scale}, batch={bs}, "
                  "fwd+decode+NMS, scan-diff)",
        "img_per_s": {k: round(v, 1) for k, v in rates.items()},
        "wide_over_square": round(rates[f"{short}x{imgsz}"] / square, 3),
        "tall_over_square": round(rates[f"{imgsz}x{short}"] / square, 3),
        "note": "rect=True vals wide-aspect images on the short-side canvas "
                "(75% of square pixels); ratio is the measured speedup those "
                "images get vs the square letterbox",
    }))


if __name__ == "__main__":
    main()
