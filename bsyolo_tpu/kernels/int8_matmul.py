"""Int8 MXU matmul kernel — the "2x int8 peak" probe (round 5).

Round 2 measured on-device int8 LOSING through XLA: `lax.conv` on int8
operands upcasts to the bf16 MXU path, so quantization only added requant
traffic (docs/performance.md "Quantized inference"). The open question from
VERDICT r4 #3: is the native int8 systolic path reachable from Pallas?
A 1x1 conv IS a matmul — (B*H*W, Cin) x (Cin, Cout) — so this kernel
answers the question for the shapes that dominate the head/C2PSA stages.

Kernel contract (per-output-channel symmetric quantization, the same scheme
as nn/quant.py):

    out[m, n] = (sum_k x_i8[m, k] * w_i8[k, n]) * (sx * sw[n])

with the contraction in int32 on the MXU (jnp.dot with
preferred_element_type=int32 — Mosaic emits the int8 systolic path when both
operands are int8), dequantized once at the output tile.

Tiling: int8 min tile is (32, 128) (pallas guide); blocks are
(TM, K) x (K, TN) with the full contraction axis resident in VMEM — the 1x1
conv shapes here have K <= 1024, so an x block of 256x1024 int8 is 256 KB
and double-buffering fits comfortably in the ~16 MB VMEM budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 256
TILE_N = 128


def _kernel(x_ref, w_ref, sw_ref, sx_ref, out_ref):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)
    scale = sx_ref[0, 0] * sw_ref[0, :]  # (TN,) f32
    out_ref[:] = (acc.astype(jnp.float32) * scale[None, :]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "tile_m", "tile_n", "interpret"))
def int8_matmul(x_i8, w_i8, sw, sx, out_dtype=jnp.bfloat16, tile_m=TILE_M, tile_n=TILE_N,
                interpret=False):
    """(M, K) int8 x (K, N) int8 -> (M, N) out_dtype, int32 MXU accumulation.

    sw: (N,) f32 per-output-channel weight scales; sx: () f32 activation
    scale. M must be a multiple of tile_m and N of tile_n (the 1x1-conv
    call sites pad B*H*W up; spatial sizes at 640 are already multiples).
    """
    M, K = x_i8.shape
    K2, N = w_i8.shape
    assert K == K2 and M % tile_m == 0 and N % tile_n == 0, (M, K, K2, N)
    grid = (M // tile_m, N // tile_n)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((tile_m, K), lambda i, j: (i, 0)),
            pl.BlockSpec((K, tile_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j)),
    )(x_i8, w_i8, sw.reshape(1, N).astype(jnp.float32), sx.reshape(1, 1).astype(jnp.float32))


def quantize_sym(x, axis=None, bits=8):
    """Symmetric per-tensor (axis=None) or per-axis quantization to int8."""
    qmax = 2 ** (bits - 1) - 1
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=axis is not None)
    scale = jnp.maximum(amax, 1e-8) / qmax
    q = jnp.clip(jnp.round(x / scale), -qmax - 1, qmax).astype(jnp.int8)
    return q, scale
