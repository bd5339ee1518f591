"""Layer-level int8-vs-bf16 probe on the 1x1-conv matmul shapes (round 5).

Answers VERDICT r4 #3: XLA upcasts int8 convs to the bf16 MXU path, but a
Pallas kernel can request int8 x int8 -> int32 directly
(kernels/int8_matmul.py). This measures, per dominant 1x1-conv shape of the
yolo11 head/C2PSA stages, three paths on the SAME contraction:

  bf16-xla     jnp.dot on bf16 operands (the production inference path)
  int8-xla     jnp.dot on int8 operands, preferred int32 (what nn/quant.py's
               dynamic mode lowers to — measured upcast in round 2)
  int8-pallas  the Pallas kernel (explicit int8 MXU request + fused dequant)

Scan-diff timing (relay-safe); numerics of the Pallas kernel are checked
exactly against the XLA int32 reference before timing.

Shapes: s-width @640 — C2PSA qkv/proj at 20x20 (K=N=512), head cv3 branch
1x1s at 80/40/20 (K 64..256), plus an n-width 256-channel case.
(M = batch x H x W; batch 32.)
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bsyolo_tpu.kernels.int8_matmul import int8_matmul, quantize_sym

B = int(os.environ.get("BENCH_BATCH", 32))
SHAPES = [
    # name, M, K, N
    ("C2PSA qkv s@20", B * 400, 512, 512),
    ("C2PSA mlp s@20", B * 400, 512, 1024),
    ("head p5 s@20", B * 400, 512, 256),
    ("head p4 s@40", B * 1600, 256, 256),
    ("head p3 s@80", B * 6400, 128, 128),
    ("neck n@40", B * 1600, 128, 128),
]


def scan_diff(fn, args, n1=100, n2=500):
    # n2 sized so the ~10-100 us matmuls accumulate tens of ms inside one
    # compiled call: at the original n2=20 the relay's per-dispatch jitter
    # drowned the slope (negative times in the first round-5 run).
    @partial(jax.jit, static_argnames=("n",))
    def loop(args, n):
        def body(acc, i):
            # iteration-dependent SMALL operand (the weights) so XLA cannot
            # hoist the body; perturbing the big activation matrix would add
            # a bandwidth-scale elementwise op that biases the measurement
            w = args[1]
            w = (w.astype(jnp.int32) + i).astype(w.dtype) \
                if w.dtype == jnp.int8 else w + i.astype(w.dtype)
            out = fn(args[0], w, *args[2:])
            # consume the FULL output: a sliced consumption (out[:1,:1]) lets
            # XLA push the slice into the dot and elide the whole matmul for
            # the non-opaque paths — the first round-5 run measured exactly
            # that (a "6800 TFLOP/s" bf16 dot). The full-output reduce adds
            # one M*N read, identical across all three variants.
            return acc + jnp.sum(out.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n, dtype=jnp.int32))
        return acc

    def timed(n):
        float(loop(args, n))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(args, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(n2) - timed(n1)) / (n2 - n1)


def main():
    rng = np.random.default_rng(0)
    print(f"# int8 matmul probe, batch={B}", file=sys.stderr)
    totals = {"bf16": 0.0, "int8_xla": 0.0, "int8_pallas": 0.0}
    for name, M, K, N in SHAPES:
        x = rng.normal(0, 1, (M, K)).astype(np.float32)
        w = rng.normal(0, 0.05, (K, N)).astype(np.float32)
        xq, sx = quantize_sym(jnp.asarray(x))
        wq, sw = quantize_sym(jnp.asarray(w), axis=0)
        sw_vec = sw.reshape(-1)
        x16 = jnp.asarray(x, jnp.bfloat16)
        w16 = jnp.asarray(w, jnp.bfloat16)

        # exact numerics: pallas int32 accumulation vs XLA int32 reference
        ref32 = jax.jit(
            lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
        )(xq, wq)
        got = int8_matmul(xq, wq, sw_vec, sx.reshape(()), out_dtype=jnp.float32)
        want = np.asarray(ref32, np.float32) * (float(sx) * np.asarray(sw_vec))[None, :]
        rel = np.abs(np.asarray(got) - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 2e-3, f"{name}: pallas mismatch rel={rel}"

        t_bf16 = scan_diff(
            lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32), (x16, w16)
        )
        t_i8x = scan_diff(
            lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            ),
            (xq, wq),
        )
        t_i8p = scan_diff(
            lambda a, b: int8_matmul(a, b, sw_vec, sx.reshape(())), (xq, wq)
        )
        totals["bf16"] += t_bf16
        totals["int8_xla"] += t_i8x
        totals["int8_pallas"] += t_i8p
        gflop = 2 * M * K * N / 1e9
        print(
            {
                "layer": name, "mkn": (M, K, N),
                "bf16_ms": round(t_bf16 * 1e3, 3),
                "int8_xla_ms": round(t_i8x * 1e3, 3),
                "int8_pallas_ms": round(t_i8p * 1e3, 3),
                "pallas_vs_bf16": round(t_bf16 / t_i8p, 2),
                "bf16_tflops": round(gflop / t_bf16 / 1e3, 1),
                "pallas_tops": round(gflop / t_i8p / 1e3, 1),
            }
        )
    print(
        {
            "total_bf16_ms": round(totals["bf16"] * 1e3, 2),
            "total_int8_xla_ms": round(totals["int8_xla"] * 1e3, 2),
            "total_int8_pallas_ms": round(totals["int8_pallas"] * 1e3, 2),
            "pallas_speedup_vs_bf16": round(totals["bf16"] / totals["int8_pallas"], 2),
        }
    )


if __name__ == "__main__":
    main()
