"""Deformable-op autotune sweep — the TPU analog of the reference's
DCNv4 kernel search scripts (reference DCNv4_op/scripts/search_dcnv4*.py).

The reference tunes CUDA launch parameters (threads, im2col步长) per shape.
On TPU the op is an XLA gather-composition (ops/deform.py dcnv3_core), so
the tunables are the *formulation*: batch size, channels-per-group, and
whether the multi-scale attention variant chunks queries. This sweeps those
and prints a tuned table (one JSON line per config) using the same
scan-diff timing as bench.py (relay RTT cancels).

Run: python examples/search_deform.py            # sweep DCNv3/v4 shapes
     DEFORM_MSDA=1 python examples/search_deform.py   # RT-DETR MSDeformAttn

Design note (why no Pallas deform kernel): each deformable tap is a
4-point bilinear gather at a data-dependent location. On GPU the CUDA
flash_deform kernel wins by coalescing those loads in shared memory; on TPU
a Pallas kernel would issue per-point dynamic (1, 1, C)-vector loads that
cannot fill the 8x128 VPU lanes, while XLA lowers the batched take_along_axis
to a hardware dynamic-gather over contiguous channel vectors and fuses the
weighting arithmetic around it. The composition IS the fast path; the sweep
below picks its best shape parameters.
"""

import itertools
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def scan_diff(fn, args, n1=4, n2=12):
    """Per-iter seconds via two chained-scan lengths (see bench.py)."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames="n")
    def loop(a, n):
        def body(carry, i):
            out = fn(*[x + (i * 1e-6).astype(x.dtype) if x.dtype.kind == "f" else x for x in carry])
            bump = jnp.sum(out).astype(a[0].dtype) * 1e-9
            return tuple(x + bump if x.dtype.kind == "f" else x for x in carry), None

        carry, _ = jax.lax.scan(body, a, jnp.arange(n, dtype=jnp.float32))
        return sum(jnp.sum(x) for x in carry if x.dtype.kind == "f")

    ts = {}
    for n in (n1, n2):
        float(loop(args, n))  # compile + warm
        t0 = time.perf_counter()
        float(loop(args, n))
        ts[n] = time.perf_counter() - t0
    return (ts[n2] - ts[n1]) / (n2 - n1)


def sweep_dcn():
    import jax.numpy as jnp

    from bsyolo_tpu.ops.deform import dcnv3_core

    rng = np.random.default_rng(0)
    rows = []
    for (B, H, C), G in itertools.product(
        [(8, 40, 256), (16, 40, 256), (8, 80, 128)], [4, 8, 16]
    ):
        Gc = C // G
        x = jnp.asarray(rng.normal(size=(B, H, H, C)).astype(np.float32))
        off = jnp.asarray(rng.normal(size=(B, H, H, G * 9 * 2)).astype(np.float32))
        m = jnp.asarray(rng.normal(size=(B, H, H, G * 9)).astype(np.float32))

        def fn(x, off, m):
            return dcnv3_core(x, off, m, group=G, group_channels=Gc)

        dt = scan_diff(fn, (x, off, m))
        rows.append({"op": "dcnv3", "B": B, "HW": H, "C": C, "G": G, "Gc": Gc,
                     "ms": round(dt * 1e3, 3), "imgs_s": round(B / dt, 1)})
        print(json.dumps(rows[-1]))
    best = min(rows, key=lambda r: r["ms"] / r["B"])
    print(json.dumps({"tuned": best}))


def sweep_msda():
    import jax.numpy as jnp

    from bsyolo_tpu.nn.transformer import ms_deform_attn_sample

    rng = np.random.default_rng(0)
    shapes = [(80, 80), (40, 40), (20, 20)]
    L = sum(h * w for h, w in shapes)
    rows = []
    for B, Q, Hh in itertools.product([1, 4], [300], [8]):
        v = jnp.asarray(rng.normal(size=(B, L, Hh, 32)).astype(np.float32))
        loc = jnp.asarray(rng.uniform(0, 1, (B, Q, Hh, 3, 4, 2)).astype(np.float32))
        w = jnp.asarray(rng.uniform(0, 1, (B, Q, Hh, 3, 4)).astype(np.float32))

        def fn(v, loc, w):
            return ms_deform_attn_sample(v, shapes, loc, w)

        dt = scan_diff(fn, (v, loc, w))
        rows.append({"op": "msda", "B": B, "Q": Q, "heads": Hh,
                     "ms": round(dt * 1e3, 3)})
        print(json.dumps(rows[-1]))


if __name__ == "__main__":
    if os.environ.get("DEFORM_MSDA"):
        sweep_msda()
    else:
        sweep_dcn()
