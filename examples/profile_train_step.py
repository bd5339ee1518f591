"""Locate where the train step spends its time (relay-safe scan-diff).

Times four nested slices of the yolo11-BS train step on the live device:
  fwd         — model.apply(train=True) only
  fwd+loss    — + v8DetectionLoss (TAL assignment, CIoU+NWD, DFL)
  fwd+bwd     — value_and_grad of (forward -> scalar), no detection loss
  full step   — engine/train_step.py step_fn (loss + bwd + SGD/EMA/BN)

Each slice runs N times inside one compiled lax.scan with iteration-
dependent inputs; per-iter time is the slope between two N values
(see bench.py for why naive timing is invalid through the relay).

Usage: [BENCH_SCALE=n] [BENCH_IMGSZ=640] [BENCH_BATCH=32] python examples/profile_train_step.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench_train import build_step

    scale = os.environ.get("BENCH_SCALE", "n")
    img_size = int(os.environ.get("BENCH_IMGSZ", 640))
    bs = int(os.environ.get("BENCH_BATCH", 32))
    M = 64

    spec, step_fn, state = build_step(scale, img_size, bs)
    model_apply_vars = {"params": state.params, "batch_stats": state.batch_stats}

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (bs, img_size, img_size, 3)).astype(np.float32))
    batch = {
        "img": img,
        "cls": jnp.asarray(rng.integers(0, 80, (bs, M)).astype(np.int32)),
        "bboxes": jnp.asarray(
            np.concatenate(
                [rng.uniform(0.3, 0.7, (bs, M, 2)), rng.uniform(0.05, 0.25, (bs, M, 2))], -1
            ).astype(np.float32)
        ),
        "mask": jnp.asarray((np.arange(M)[None] < 8).astype(np.float32).repeat(bs, 0)),
    }

    from bsyolo_tpu.losses.detect import detection_loss, init_loss_state
    from bsyolo_tpu.nn import build_model, load_model_yaml, parse_model_yaml
    from bsyolo_tpu.cfg import model_yaml_path

    d = load_model_yaml(model_yaml_path("yolo11.yaml"))
    d["nc"] = 80
    spec2 = parse_model_yaml(d, scale=scale)
    model, variables = build_model(spec2, img_size=img_size, dtype=jnp.bfloat16)
    from bsyolo_tpu.losses import DetectionLossConfig

    loss_cfg = DetectionLossConfig(
        nc=spec2.nc, strides=spec2.head_strides,
        assigner_bf16=bool(os.environ.get("BENCH_ASSIGNER_BF16")),
    )
    ls0 = init_loss_state()

    def fwd_only(v, x):
        outs, _ = model.apply(v, x, train=True, mutable=["batch_stats"])
        return sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree_util.tree_leaves(outs))

    def fwd_loss(v, x):
        outs, _ = model.apply(v, x, train=True, mutable=["batch_stats"])
        total, items, _ = detection_loss(outs, batch["cls"], batch["bboxes"], batch["mask"], ls0, loss_cfg)
        return total

    def fwd_bwd(v, x):
        g = jax.grad(lambda p: fwd_only({"params": p, "batch_stats": v["batch_stats"]}, x))(v["params"])
        return sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree_util.tree_leaves(g))

    def fwd_dgrad(v, x):
        # grad wrt the INPUT only: the backward sweep computes every layer's
        # activation gradient (dgrad chain) but NO weight gradients — so
        # (fwd+bwd) - (fwd+dgrad) isolates the wgrad convs' cost
        g = jax.grad(lambda xx: fwd_only(v, xx))(x)
        return jnp.sum(g.astype(jnp.float32))

    def fwd_bwd_remat(v, x):
        # full-remat lever: recompute the forward during the backward instead
        # of saving activations — trades +1 fwd FLOPs for HBM traffic
        f = jax.checkpoint(
            lambda p, xx: fwd_only({"params": p, "batch_stats": v["batch_stats"]}, xx),
            policy=jax.checkpoint_policies.nothing_saveable,
        )
        g = jax.grad(lambda p: f(p, x))(v["params"])
        return sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree_util.tree_leaves(g))

    def fwd_bwd_remat_seg(v, x):
        # segment-remat lever: save ONLY the per-layer boundary activations
        # (the checkpoint_name "bs_seg" tags in nn/model.py) and recompute
        # intra-block residuals from the nearest boundary during the backward
        f = jax.checkpoint(
            lambda p, xx: fwd_only({"params": p, "batch_stats": v["batch_stats"]}, xx),
            policy=jax.checkpoint_policies.save_only_these_names("bs_seg"),
        )
        g = jax.grad(lambda p: f(p, x))(v["params"])
        return sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree_util.tree_leaves(g))

    def fwd_bwd_remat_light(v, x):
        # inverse of seg: save ordinary residuals, never store the tagged
        # boundary outputs — recompute them elementwise when needed
        f = jax.checkpoint(
            lambda p, xx: fwd_only({"params": p, "batch_stats": v["batch_stats"]}, xx),
            policy=jax.checkpoint_policies.save_anything_except_these_names("bs_seg"),
        )
        g = jax.grad(lambda p: f(p, x))(v["params"])
        return sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree_util.tree_leaves(g))

    def fwd_loss_bwd(v, x):
        g = jax.grad(lambda p: fwd_loss({"params": p, "batch_stats": v["batch_stats"]}, x))(v["params"])
        return sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree_util.tree_leaves(g))

    def make_scan(fn):
        @partial(jax.jit, static_argnames=("n",))
        def loop(v, x, n):
            def body(carry, i):
                xx, acc = carry
                out = fn(v, xx + (i * 1e-6).astype(xx.dtype))
                return (x + (out * 1e-12).astype(xx.dtype), acc + out), None

            (_, acc), _ = jax.lax.scan(body, (x, jnp.float32(0)), jnp.arange(n, dtype=jnp.float32))
            return acc

        return loop

    def timed(loop, label, n1=2, n2=10):
        ts = {}
        for n in (n1, n2):
            float(loop(variables, img, n))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop(variables, img, n))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        per = (ts[n2] - ts[n1]) / (n2 - n1)
        print(f"{label:14s} {per*1000:8.2f} ms/iter  {bs/per:8.1f} img/s", flush=True)
        return per

    @partial(jax.jit, static_argnames=("n",))
    def full_loop(st, b, n):
        def body(carry, i):
            s, acc = carry
            bb = dict(b)
            bb["img"] = b["img"] + (i * 1e-6).astype(b["img"].dtype)
            s, m = step_fn(s, bb)
            return (s, acc + m["loss"]), None

        (s, acc), _ = jax.lax.scan(body, (st, jnp.float32(0)), jnp.arange(n, dtype=jnp.float32))
        return acc

    def timed_full(n1=2, n2=10):
        ts = {}
        for n in (n1, n2):
            float(full_loop(state, batch, n))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(full_loop(state, batch, n))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        per = (ts[n2] - ts[n1]) / (n2 - n1)
        print(f"{'full step':14s} {per*1000:8.2f} ms/iter  {bs/per:8.1f} img/s", flush=True)
        return per

    # BENCH_SLICES=comma-list picks a subset (names below); default = all
    want = os.environ.get("BENCH_SLICES")
    want = set(want.split(",")) if want else None
    run = lambda name: want is None or name in want

    print(f"# scale={scale} imgsz={img_size} batch={bs}", flush=True)
    t_f = timed(make_scan(fwd_only), "fwd") if run("fwd") else None
    if run("loss"):
        timed(make_scan(fwd_loss), "fwd+loss")
    t_d = timed(make_scan(fwd_dgrad), "fwd+dgrad") if run("dgrad") else None
    t_b = timed(make_scan(fwd_bwd), "fwd+bwd") if run("bwd") else None
    if t_f is not None and t_d is not None and t_b is not None:
        print(f"{'  => dgrad':14s} {(t_d - t_f)*1000:8.2f} ms  (activation-grad chain)", flush=True)
        print(f"{'  => wgrad':14s} {(t_b - t_d)*1000:8.2f} ms  (weight-grad convs)", flush=True)
    if run("remat"):
        timed(make_scan(fwd_bwd_remat), "fwd+bwd remat")
    if run("seg"):
        timed(make_scan(fwd_bwd_remat_seg), "fwd+bwd seg")
    if run("light"):
        timed(make_scan(fwd_bwd_remat_light), "fwd+bwd light")
    if run("lossbwd"):
        timed(make_scan(fwd_loss_bwd), "fwd+loss+bwd")
    if run("full"):
        timed_full()


if __name__ == "__main__":
    main()
