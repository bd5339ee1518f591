"""Weight-gradient (wgrad) contraction lever experiment — round 5.

Round 4 measured the backward wall: wgrad convs are 44.7 of 75.8 backward ms
at yolo11n/640 batch 32 (docs/performance.md). Each (3,3,Cin,Cout) weight
gradient is a tiny-output contraction over the huge batchxspatial axis; at
n-width Cin/Cout are 16-64, so the MXU runs at a few % lane fill and the
saved activations + incoming grads are pure HBM traffic.

This script measures, per dominant layer shape, three formulations of the
SAME contraction dw[kh,kw,ci,co] = sum_{b,h,w} x[b,h*s+kh,w*s+kw,ci] *
g[b,h,w,co]:

  native      XLA's transpose-conv emission (what jax.vjp of
              lax.conv_general_dilated produces — the production backward)
  im2col      lax.conv_general_dilated_patches -> one dot_general
              (B*H*W, K*K*Cin) x (B*H*W, Cout): a single clean matmul with
              a huge contraction axis instead of a conv with batch as the
              contracting dim
  im2col-bf16 the same matmul accumulating in bf16 instead of f32
              (halves the MXU output write traffic; precision trade)

Timing: scan-diff (N iterations inside one compiled lax.scan with
iteration-dependent inputs, difference two N values) — relay-safe, same
protocol as bench.py. Numerics: each variant is checked against native in
f32 before timing.

Verdict feeds docs/performance.md ("attack the wgrad wall", VERDICT r4 #1).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# yolo11n @640: the 3x3 convs that carry the wgrad wall (NHWC shapes after
# the layer's stride): (B, H, W, Cin) -> conv k3 stride s -> Cout
SHAPES = [
    # name, H, W, Cin, Cout, stride
    ("stem1 320->160", 640, 640, 3, 16, 2),
    ("stem2 160", 320, 320, 16, 32, 2),
    ("c3k2-1 80", 160, 160, 32, 64, 2),
    ("body 80x64", 80, 80, 64, 64, 1),
    ("down 40x128", 80, 80, 64, 128, 2),
    ("body 40x128", 40, 40, 128, 128, 1),
    ("down 20x256", 40, 40, 128, 256, 2),
    ("body 20x256", 20, 20, 256, 256, 1),
]


def make_wgrad_fns(B, H, W, Cin, Cout, s, dtype=jnp.bfloat16):
    K = 3
    pad = 1
    Ho, Wo = H // s, W // s
    dn = jax.lax.conv_dimension_numbers(
        (B, H, W, Cin), (K, K, Cin, Cout), ("NHWC", "HWIO", "NHWC")
    )

    def conv(x, w):
        # bf16 in -> bf16 out, matching the production flax conv (dtype=bf16)
        return jax.lax.conv_general_dilated(
            x, w, (s, s), [(pad, pad), (pad, pad)], dimension_numbers=dn
        )

    w0 = jnp.zeros((K, K, Cin, Cout), dtype)

    def native(x, g):
        _, vjp_fn = jax.vjp(lambda w: conv(x, w), w0)
        return vjp_fn(g)[0]

    def im2col(x, g, acc=jnp.float32):
        # patches: (B, Ho, Wo, Cin*K*K) — feature dim ordered (ci, kh, kw)
        p = jax.lax.conv_general_dilated_patches(
            x, (K, K), (s, s), [(pad, pad), (pad, pad)],
            dimension_numbers=dn,
        )
        dw = jax.lax.dot_general(
            p.reshape(B * Ho * Wo, Cin * K * K),
            g.reshape(B * Ho * Wo, Cout).astype(p.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=acc,
        )
        # (Cin*K*K, Cout) -> (K, K, Cin, Cout): patches order is (ci, kh, kw)
        return dw.reshape(Cin, K, K, Cout).transpose(1, 2, 0, 3)

    return native, im2col


def scan_diff(fn, args, n1=40, n2=200):
    # n2 sized so even the sub-ms wgrad kernels accumulate ~100ms inside one
    # compiled call — the relay's per-dispatch jitter (~ms) otherwise drowns
    # the slope and can print negative times (seen in the first round-5 run)
    """Best-of-3 scan-diff per-iteration seconds for fn(*args)."""

    @partial(jax.jit, static_argnames=("n",))
    def loop(args, n):
        def body(acc, i):
            a0 = args[0] + (i * 1e-6).astype(args[0].dtype)
            out = fn(a0, *args[1:])
            return acc + jnp.sum(out.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n, dtype=jnp.float32))
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
    B = int(os.environ.get("BENCH_BATCH", 32))
    rng = np.random.default_rng(0)
    print(f"# wgrad lever bench, batch={B}, bf16 operands", file=sys.stderr)
    rows = []
    tot = {"native": 0.0, "im2col": 0.0, "im2col_bf16": 0.0}
    for name, H, W, Cin, Cout, s in SHAPES:
        Ho, Wo = H // s, W // s
        x = jnp.asarray(rng.normal(0, 1, (B, H, W, Cin)).astype(np.float32), jnp.bfloat16)
        g = jnp.asarray(rng.normal(0, 1, (B, Ho, Wo, Cout)).astype(np.float32), jnp.bfloat16)
        native, im2col = make_wgrad_fns(B, H, W, Cin, Cout, s)

        # numerics check (f32 compare, bf16 operands)
        ref = np.asarray(jax.jit(native)(x, g), np.float32)
        got = np.asarray(jax.jit(im2col)(x, g), np.float32)
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 2e-2, f"{name}: im2col mismatch rel={rel}"

        t_nat = scan_diff(native, (x, g))
        t_i2c = scan_diff(im2col, (x, g))
        t_i2cb = scan_diff(lambda x, g: im2col(x, g, acc=jnp.bfloat16), (x, g))
        tot["native"] += t_nat
        tot["im2col"] += t_i2c
        tot["im2col_bf16"] += t_i2cb
        row = {
            "layer": name, "shape": f"{H}x{W}x{Cin}->{Cout}/s{s}",
            "native_ms": round(t_nat * 1e3, 2),
            "im2col_ms": round(t_i2c * 1e3, 2),
            "im2col_bf16_ms": round(t_i2cb * 1e3, 2),
            "im2col_vs_native": round(t_nat / t_i2c, 2),
        }
        rows.append(row)
        print(row)
    print(
        {
            "total_native_ms": round(tot["native"] * 1e3, 2),
            "total_im2col_ms": round(tot["im2col"] * 1e3, 2),
            "total_im2col_bf16_ms": round(tot["im2col_bf16"] * 1e3, 2),
            "speedup_im2col": round(tot["native"] / tot["im2col"], 2),
            "speedup_im2col_bf16": round(tot["native"] / tot["im2col_bf16"], 2),
        }
    )


if __name__ == "__main__":
    main()
