"""Benchmark harness (reference utils/benchmarks.py: benchmark / ProfileModels).

- ``profile_model``: forward/decode/NMS latency + throughput of one model at
  given batch sizes, using scan-diff timing (dispatch RTT cancels — naive
  timing through the TPU relay is meaningless; see bench.py).
- ``benchmark``: export to each supported format and verify each artifact
  round-trips a prediction, reporting size + status (the reference's
  export-all-then-val sweep, scoped to the formats this stack supports).
"""

from __future__ import annotations

import time
from functools import partial
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from bsyolo_tpu.utils import LOGGER


def profile_model(
    model, spec, variables, imgsz: int = 640, batch_sizes=(1, 16), n1: int = 2, n2: int = 12
) -> List[Dict]:
    import jax
    import jax.numpy as jnp

    from bsyolo_tpu.nn.heads import decode_detections
    from bsyolo_tpu.ops.nms import non_max_suppression

    strides, nc = spec.head_strides, spec.nc

    def predict(variables, x):
        feats = model.apply(variables, x, train=False)
        preds = decode_detections(feats, strides, nc)
        return non_max_suppression(preds, conf_thres=0.25, max_det=300, pre_k=512)

    @partial(jax.jit, static_argnames="n")
    def loop(v, x, n):
        def body(carry, i):
            xx, acc = carry
            out = predict(v, xx + (i * 1e-6).astype(x.dtype))
            return (x + (out[0, 0, 0] * 1e-9).astype(x.dtype), acc + jnp.sum(out)), None

        (_, acc), _ = jax.lax.scan(body, (x, jnp.float32(0)), jnp.arange(n, dtype=jnp.float32))
        return acc

    rows = []
    for bs in batch_sizes:
        x = jnp.zeros((bs, imgsz, imgsz, 3), jnp.float32)
        ts = {}
        for n in (n1, n2):
            float(loop(variables, x, n))  # compile+warm
            t0 = time.perf_counter()
            float(loop(variables, x, n))
            ts[n] = time.perf_counter() - t0
        per = (ts[n2] - ts[n1]) / (n2 - n1)
        rows.append(
            {
                "batch": bs,
                "latency_ms": round(per * 1000, 2),
                "throughput_img_s": round(bs / per, 1),
            }
        )
        LOGGER.info(f"profile bs={bs}: {per*1000:.2f} ms/iter, {bs/per:.0f} img/s")
    return rows


def benchmark(
    yolo,
    imgsz: int = 320,
    out_dir: str = "runs/benchmark",
    data: Optional[str] = None,
    batch: int = 8,
) -> List[Dict]:
    """Export to every supported format; verify each artifact runs.

    With ``data`` (detect task only), each runnable artifact is additionally
    mAP-validated through AutoBackend and its raw forward latency timed — the
    reference's full format/size/mAP/speed table (utils/benchmarks.py:50
    benchmark: export-all, then ``YOLO(export_path).val(...)`` per format).
    """
    import jax.numpy as jnp

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rows = []
    formats = ["stablehlo", "onnx", "params", "saved_model", "tflite"]
    runnable = {"stablehlo", "onnx", "saved_model", "tflite"}  # AutoBackend-loadable
    val_data = data if getattr(yolo.spec, "task", "detect") == "detect" else None
    for fmt in formats:
        row = {"format": fmt, "status": "ok", "size_mb": None}
        try:
            path = yolo.export(
                format=fmt, imgsz=imgsz, batch=batch if val_data else 1,
                output=str(out / f"model.{fmt}"),
            )
            p = Path(path)
            size = p.stat().st_size if p.is_file() else sum(f.stat().st_size for f in p.rglob("*"))
            row["size_mb"] = round(size / 1e6, 2)
            if fmt == "stablehlo" and not val_data:  # round-trip check
                from bsyolo_tpu.engine.exporter import load_stablehlo

                fn = load_stablehlo(path)
                preds = fn(jnp.zeros((1, imgsz, imgsz, 3), jnp.float32))
                row["output_shape"] = tuple(int(v) for v in preds.shape)
            elif fmt == "onnx" and not val_data:  # round-trip through the bundled evaluator
                from bsyolo_tpu.onnx import OnnxModule

                preds = OnnxModule(path)(jnp.zeros((1, imgsz, imgsz, 3), jnp.float32))[0]
                row["output_shape"] = tuple(int(v) for v in preds.shape)
            if val_data and fmt in runnable:
                from bsyolo_tpu.engine.backend import AutoBackend, validate_artifact

                backend = AutoBackend(path, imgsz)  # loaded once: val + timing
                m = validate_artifact(
                    path, val_data, batch=batch, imgsz=imgsz, verbose=False, backend=backend
                )
                row["map50"] = round(float(m.box.map50), 4)
                row["map50_95"] = round(float(m.box.map), 4)
                b = int(backend.meta.get("batch", batch))  # static artifact shapes
                backend.warmup(b)
                x = np.zeros((b, backend.imgsz, backend.imgsz, 3), np.float32)
                t0 = time.perf_counter()
                iters = 3
                for _ in range(iters):
                    backend.forward(x)
                row["ms_per_img"] = round((time.perf_counter() - t0) / (iters * b) * 1000, 2)
        except Exception as e:
            row["status"] = f"failed: {type(e).__name__}: {e}"
        rows.append(row)
        speed = (
            f", mAP50 {row['map50']}, {row['ms_per_img']} ms/img"
            if "map50" in row and "ms_per_img" in row
            else ""
        )
        LOGGER.info(f"benchmark {fmt}: {row['status']} ({row['size_mb']} MB{speed})")
    return rows
