"""Training-step benchmark: yolo11-BS train throughput on one TPU chip.

Measures the REAL jitted training step (engine/train_step.py: forward +
v8DetectionLoss with TAL assignment + backward + SGD/EMA update + BN stats),
the reference's core product (reference engine/trainer.py:318 _do_train hot
loop), in bf16 compute / f32 params at 640x640.

Methodology: same relay-safe scan-diff protocol as bench.py — N full train
steps inside ONE compiled lax.scan carrying the complete TrainState, with
iteration-dependent images so nothing folds; per-step time is the slope
between two N values. Also measures the multiprocess input pipeline
(data/build.py fork worker pool) feeding rate on this host against the
device step time, reporting the feed ratio (>1 means the loader can keep
the chip busy).

Prints ONE JSON line per config on stdout.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def build_step(scale: str, img_size: int, bs: int):
    import jax.numpy as jnp

    from bsyolo_tpu.cfg import model_yaml_path
    from bsyolo_tpu.engine.optim import OptimConfig
    from bsyolo_tpu.engine.train_step import StepConfig, init_train_state, make_train_step
    from bsyolo_tpu.losses import DetectionLossConfig
    from bsyolo_tpu.nn import build_model, load_model_yaml, parse_model_yaml

    d = load_model_yaml(model_yaml_path("yolo11.yaml"))
    d["nc"] = 80
    spec = parse_model_yaml(d, scale=scale)
    model, variables = build_model(spec, img_size=img_size, dtype=jnp.bfloat16)
    cfg = StepConfig(
        loss=DetectionLossConfig(
            nc=spec.nc, strides=spec.head_strides,
            assigner_bf16=bool(os.environ.get("BENCH_ASSIGNER_BF16")),
        ),
        optim=OptimConfig(name="SGD", lr0=0.01, epochs=100, nbs=64),
        batch_size=bs,
        nb=100,
        nw=0,  # past warmup: the steady-state hot loop
        use_adamw=False,
        weight_decay=5e-4,
        remat=os.environ.get("BENCH_REMAT", ""),  # cfg remat lever: 0/off | 1/full | seg | light
    )
    step_fn = make_train_step(model, cfg, jit=False)
    state = init_train_state(variables, cfg)
    return spec, step_fn, state


def main():
    import jax
    import jax.numpy as jnp

    img_size = int(os.environ.get("BENCH_IMGSZ", 640))
    scale = os.environ.get("BENCH_SCALE", "n")
    batches = [int(b) for b in os.environ.get("BENCH_BATCHES", "16,32,64,128").split(",")]
    M = 64  # padded gt slots per image (bsyolo-style detection batch)

    # bf16 peak for v5e ~197 TFLOP/s; train FLOPs ~= 3x forward (fwd + 2x bwd);
    # per-image forward GFLOPs are published @640 and scale with pixel count
    GFLOPS_FWD = {"n": 6.5, "s": 21.5, "m": 68.0}.get(scale, 6.5) * (img_size / 640.0) ** 2
    PEAK_TFLOPS = 197.0

    results = []
    for bs in batches:
        spec, step_fn, state = build_step(scale, img_size, bs)
        rng = np.random.default_rng(0)
        # uint8 batches: the production loader dtype since round 4
        # (ops/normalize.py casts inside the step). 4x smaller than f32 —
        # at m/640/128 the f32 batch alone was 629 MB of the HBM peak.
        img = jnp.asarray(rng.integers(0, 256, (bs, img_size, img_size, 3)).astype(np.uint8))
        n_gt = 8
        batch = {
            "img": img,
            "cls": jnp.asarray(rng.integers(0, 80, (bs, M)).astype(np.int32)),
            "bboxes": jnp.asarray(
                np.concatenate(
                    [rng.uniform(0.3, 0.7, (bs, M, 2)), rng.uniform(0.05, 0.25, (bs, M, 2))], -1
                ).astype(np.float32)
            ),
            "mask": jnp.asarray((np.arange(M)[None] < n_gt).astype(np.float32).repeat(bs, 0)),
        }

        @partial(jax.jit, static_argnames=("n",))
        def train_loop(state, batch, n):
            def body(carry, i):
                st, acc = carry
                b = dict(batch)
                # iteration-dependent pixels so nothing folds (uint8-safe)
                b["img"] = batch["img"] + i.astype(jnp.uint8)
                st, m = step_fn(st, b)
                return (st, acc + m["loss"]), None

            (st, acc), _ = jax.lax.scan(body, (state, jnp.float32(0)), jnp.arange(n, dtype=jnp.float32))
            return acc

        def timed(n):
            float(train_loop(state, batch, n))  # compile + warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(train_loop(state, batch, n))
                best = min(best, time.perf_counter() - t0)
            print(f"# train scan bs={bs} n={n}: {best*1000:.1f} ms", file=sys.stderr)
            return best

        n1, n2 = 2, 10
        per_step = (timed(n2) - timed(n1)) / (n2 - n1)
        ips = bs / per_step
        tflops = ips * GFLOPS_FWD * 3 / 1000.0
        results.append(
            {
                "metric": f"yolo11{scale}-BS train step @{img_size} "
                f"(fwd+loss+bwd+SGD+EMA, bf16/f32, batch={bs}, scan-diff)",
                "value": round(ips, 1),
                "unit": "images/sec/chip",
                "step_time_ms": round(per_step * 1000, 2),
                "train_tflops": round(tflops, 1),
                "train_mfu_pct": round(100 * tflops / PEAK_TFLOPS, 1),
            }
        )
        print(json.dumps(results[-1]))

    # input-pipeline feed check: the fork worker pool on THIS host vs the
    # fastest device step above (reference concern: trainer.py dataloader
    # keeping the accelerator busy)
    try:
        cores = len(os.sched_getaffinity(0))
        ips_loader = loader_throughput(img_size)
        best = max(r["value"] for r in results)
        per_core = ips_loader / max(cores, 1)
        print(
            json.dumps(
                {
                    "metric": f"train input pipeline feed rate @{img_size} "
                    f"(host fork workers, {cores}-core host)",
                    "value": round(ips_loader, 1),
                    "unit": "images/sec",
                    "per_core": round(per_core, 1),
                    "feed_ratio_vs_best_device_step": round(ips_loader / best, 2),
                    "cores_to_saturate_device": round(best / per_core, 1),
                }
            )
        )
    except Exception as e:  # loader bench is best-effort on stripped CI hosts
        print(f"# loader bench skipped: {e}", file=sys.stderr)


def loader_throughput(img_size: int, n_images: int = 64, workers: int = 4) -> float:
    """img/s of the real train loader (mosaic+affine+HSV pipeline) on this host."""
    from bsyolo_tpu.data import DataLoader, YOLODataset

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests", "fixtures", "bsyolo8")
    ds = YOLODataset(os.path.join(root, "images", "train"), imgsz=img_size, augment=True, max_gt=64)
    loader = DataLoader(ds, batch_size=4, shuffle=True, workers=workers, seed=0)
    for _ in loader:  # warm epoch (worker pool spin-up, label cache)
        pass
    t0 = time.perf_counter()
    seen = 0
    while seen < n_images:
        loader.epoch += 1
        for b in loader:
            seen += b["img"].shape[0]
    return seen / (time.perf_counter() - t0)


def dispatch_modes(scale=None, img_size=None, bs=32, k=8, steps=16):
    """Trainer dispatch-pattern bench (BENCH_DISPATCH=1): wall time of
    `steps` training steps under

      per-step  — one jitted call per batch + per-step loss fetch, the
                  classic host-driven loop (reference trainer.py:318 and
                  this repo's default trainer path);
      chunked   — K steps per compiled lax.scan call with the K batches
                  staged in ONE transfer and ONE loss fetch
                  (train_step.make_chunked_train_step, cfg chunk_steps).

    Unlike the scan-diff numbers above this INCLUDES dispatch + transfer +
    fetch — the quantity chunking improves. Through the axon relay one
    fetch costs ~30-60 ms, so per-step mode pays ~steps x RTT."""
    import jax
    import jax.numpy as jnp

    img_size = img_size or int(os.environ.get("BENCH_IMGSZ", 640))
    scale = scale or os.environ.get("BENCH_SCALE", "n")
    M = 64
    spec, raw_step, state0 = build_step(scale, img_size, bs)
    step = jax.jit(raw_step, donate_argnums=(0,))
    chunk = jax.jit(
        lambda st, bb: jax.lax.scan(raw_step, st, bb), donate_argnums=(0,)
    )
    rng = np.random.default_rng(0)

    def host_batch(i, u8=False):
        img = rng.uniform(0, 1, (bs, img_size, img_size, 3)).astype(np.float32)
        return {
            "img": (img * 255).astype(np.uint8) if u8 else img,
            "cls": rng.integers(0, 80, (bs, M)).astype(np.int32),
            "bboxes": np.concatenate(
                [rng.uniform(0.3, 0.7, (bs, M, 2)), rng.uniform(0.05, 0.25, (bs, M, 2))], -1
            ).astype(np.float32),
            "mask": (np.arange(M)[None] < 8).astype(np.float32).repeat(bs, 0),
        }

    host_batches = [host_batch(i) for i in range(steps)]
    # real loader batches are uint8 (ops.normalize_image_batch casts on
    # device) — 4x fewer image bytes per transfer; measured as its own mode
    u8_batches = [host_batch(i, u8=True) for i in range(steps)]

    def per_step_mode(batches=host_batches):
        # fresh buffers: device_put of an already-committed array is a no-op,
        # and the donated step would delete state0 out from under later modes
        st = jax.tree_util.tree_map(jnp.copy, state0)
        acc = 0.0
        t0 = time.perf_counter()
        for hb in batches:
            st, m = step(st, {k2: jnp.asarray(v) for k2, v in hb.items()})
            acc += float(m["loss"])  # the trainer's per-step metric fetch
        return time.perf_counter() - t0, acc

    def chunked_mode(batches=host_batches):
        st = jax.tree_util.tree_map(jnp.copy, state0)
        acc = 0.0
        t0 = time.perf_counter()
        for c0 in range(0, steps, k):
            stacked = {
                k2: jnp.asarray(np.stack([b[k2] for b in batches[c0 : c0 + k]]))
                for k2 in batches[0]
            }
            st, m = chunk(st, stacked)
            acc += float(jnp.sum(m["loss"]))
        return time.perf_counter() - t0, acc

    for name, fn in (
        ("per-step", per_step_mode),
        ("chunked", chunked_mode),
        ("per-step uint8", lambda: per_step_mode(u8_batches)),
        ("chunked uint8", lambda: chunked_mode(u8_batches)),
    ):
        fn()  # compile + warm
        t, _ = fn()
        print(
            json.dumps(
                {
                    "metric": f"trainer dispatch mode {name} @{img_size} "
                    f"(yolo11{scale}, batch={bs}, {steps} steps"
                    + (f", k={k}" if name == "chunked" else "")
                    + ", incl dispatch+transfer+fetch)",
                    "value": round(bs * steps / t, 1),
                    "unit": "images/sec/chip",
                    "wall_ms_per_step": round(t / steps * 1000, 2),
                }
            )
        )


if __name__ == "__main__":
    # BENCH_DISPATCH=only skips the batch sweep (the sweep alone can eat a
    # 30-min relay window; the dispatch comparison never got its turn)
    if os.environ.get("BENCH_DISPATCH") != "only":
        main()
    if os.environ.get("BENCH_DISPATCH"):
        dispatch_modes()
