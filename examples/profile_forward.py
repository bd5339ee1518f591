"""Per-stage forward profile of the BS-YOLO graph on the live device.

docs/performance.md argues the n-width model's ~11% MFU from MXU lane-fill
arithmetic (each stage's best-case fill weighted by FLOP share). This script
MEASURES that decomposition: it compiles prefix subgraphs of the model (stem,
P2, P3, P4, backbone end, neck end, full graph incl. head) and reports the
marginal time of each stage as the difference between consecutive prefixes.

Same relay-safe scan-diff protocol as bench.py: N iterations inside one
compiled lax.scan with iteration-dependent inputs, per-iter time from the
slope between two N values.

Usage: [BENCH_SCALE=n] [BENCH_IMGSZ=640] [BENCH_BATCH=128] python examples/profile_forward.py
"""

import os
import sys
import time
from dataclasses import replace
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def stage_cuts(spec):
    """(label, n_layers) prefix cut points: the last layer of each backbone
    stride level, then neck end, then the full graph incl. head."""
    first_neck = next(l.i for l in spec.layers if l.module in ("Upsample", "Concat"))
    cuts = []
    for s in sorted({l.stride for l in spec.layers[:first_neck]}):
        last = max(l.i for l in spec.layers[:first_neck] if l.stride == s)
        label = f"P{int(np.log2(s))}/{s}x"
        if last == first_neck - 1:
            label += "+tail"  # backbone tail: SPPF / C2PSA / MSCAAttention
        cuts.append((label, last + 1))
    cuts.append(("neck", len(spec.layers) - 1))
    cuts.append(("full+head", len(spec.layers)))
    return cuts


def main():
    import jax
    import jax.numpy as jnp

    from bsyolo_tpu.cfg import model_yaml_path
    from bsyolo_tpu.nn import build_model, load_model_yaml, parse_model_yaml

    scale = os.environ.get("BENCH_SCALE", "n")
    img_size = int(os.environ.get("BENCH_IMGSZ", 640))
    bs = int(os.environ.get("BENCH_BATCH", 128))

    d = load_model_yaml(model_yaml_path(os.environ.get("BENCH_MODEL", "yolo11.yaml")))
    spec = parse_model_yaml(d, scale=scale)
    cuts = stage_cuts(spec)
    print(f"model={spec.yaml_name} scale={scale} imgsz={img_size} batch={bs}")
    print(f"prefix cuts: {cuts}", flush=True)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (bs, img_size, img_size, 3)).astype(np.float32))

    def timed_prefix(n_layers):
        sub = replace(
            spec,
            layers=spec.layers[:n_layers],
            save=tuple(s for s in spec.save if s < n_layers - 1),
        )
        model, variables = build_model(sub, img_size=img_size, dtype=jnp.bfloat16)
        from bsyolo_tpu.nn.model import cast_inference_params

        variables = cast_inference_params(variables)

        @partial(jax.jit, static_argnames=("n",))
        def loop(v, x, n):
            def body(carry, i):
                xx, acc = carry
                out = model.apply(v, xx + (i * 1e-6).astype(xx.dtype), train=False,
                                  return_saved=True)
                s = sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree_util.tree_leaves(out))
                return (xx, acc + s), None

            (_, acc), _ = jax.lax.scan(body, (x, jnp.float32(0)), jnp.arange(n, dtype=jnp.float32))
            return acc

        ts = {}
        for n in (2, 10):
            float(loop(variables, img, n))  # compile + warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop(variables, img, n))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        return (ts[10] - ts[2]) / 8

    rows = []
    prev_t = 0.0
    for label, n_layers in cuts:
        t = timed_prefix(n_layers)
        rows.append((label, n_layers, t, t - prev_t))
        print(f"prefix<= {n_layers:3d} ({label:12s}): {t*1000:8.2f} ms cumulative, "
              f"marginal {1000*(t-prev_t):8.2f} ms", flush=True)
        prev_t = t

    full = rows[-1][2]
    print("\nstage breakdown (marginal cost, % of full forward):")
    for label, n_layers, t, dt in rows:
        print(f"  {label:12s} {dt*1000:8.2f} ms  {100*dt/full:5.1f}%")
    print(f"\nfull forward: {full*1000:.2f} ms/batch  {bs/full:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
