"""Fused detect-head decode as a Pallas TPU kernel.

Fuses the box half of the post-head decode (reference Detect._inference,
head.py:100-131) into one VMEM-resident pass per anchor tile:

    DFL softmax-expectation over 16 bins -> dist2bbox around the anchor
    -> * stride      (+ sigmoid(cls) fused in the same grid pass)

Mosaic constraints shaped the design (see pallas guide):
- no lane-dimension reshapes (64 -> 4x16 is an unsupported shape cast), so
  the per-side softmax uses masked lane reductions on the (TILE_A, 64) block;
- lane slices must be 128-aligned, so box logits and class logits enter as
  separate inputs instead of slicing one (TILE_A, 64+nc) block;
- iota must be integer-typed and >= 2D.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

TILE_A = 512
REG_MAX = 16


def pallas_supported() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _decode_kernel(box_ref, cls_ref, anchors_ref, strides_ref, box_out, cls_out):
    """(1, TILE_A, 64) + (1, TILE_A, nc) -> (1, TILE_A, 4) + (1, TILE_A, nc)."""
    d = _dfl_expectation(box_ref[0].astype(jnp.float32))  # (ta, 4) l,t,r,b
    ax = anchors_ref[:, 0]
    ay = anchors_ref[:, 1]
    s = strides_ref[:, 0]
    x1 = ax - d[:, 0]
    y1 = ay - d[:, 1]
    x2 = ax + d[:, 2]
    y2 = ay + d[:, 3]
    box_out[0] = jnp.stack(
        [(x1 + x2) * 0.5 * s, (y1 + y2) * 0.5 * s, (x2 - x1) * s, (y2 - y1) * s], axis=-1
    )
    cls_out[0] = jax.nn.sigmoid(cls_ref[0].astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("nc", "interpret"))
def fused_decode_pallas(
    flat: jax.Array,  # (B, A, 4*REG_MAX + nc) raw head channels
    anchors: jax.Array,  # (A, 2) grid centers (feature units)
    strides: jax.Array,  # (A, 1)
    nc: int,
    interpret: bool = False,
) -> jax.Array:
    """(B, A, no) -> (B, A, 4+nc) decoded xywh + sigmoid scores."""
    B, A, no = flat.shape
    box_logits = flat[..., : 4 * REG_MAX]
    cls_logits = flat[..., 4 * REG_MAX : 4 * REG_MAX + nc]
    pad = (-A) % TILE_A
    if pad:
        box_logits = jnp.pad(box_logits, ((0, 0), (0, pad), (0, 0)))
        cls_logits = jnp.pad(cls_logits, ((0, 0), (0, pad), (0, 0)))
        anchors = jnp.pad(anchors, ((0, pad), (0, 0)))
        strides = jnp.pad(strides, ((0, pad), (0, 0)), constant_values=1.0)
    Ap = A + pad
    grid = (B, Ap // TILE_A)

    boxes, scores = pl.pallas_call(
        _decode_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE_A, 4 * REG_MAX), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, TILE_A, nc), lambda b, i: (b, i, 0)),
            pl.BlockSpec((TILE_A, 2), lambda b, i: (i, 0)),
            pl.BlockSpec((TILE_A, 1), lambda b, i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE_A, 4), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, TILE_A, nc), lambda b, i: (b, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Ap, 4), jnp.float32),
            jax.ShapeDtypeStruct((B, Ap, nc), jnp.float32),
        ),
        interpret=interpret,
    )(box_logits, cls_logits, anchors.astype(jnp.float32), strides.astype(jnp.float32))
    return jnp.concatenate([boxes[:, :A], scores[:, :A]], axis=-1)


def decode_detections_pallas(feats, strides, nc: int, interpret: bool = False):
    """Drop-in for nn.heads.decode_detections using the Pallas kernel."""
    from bsyolo_tpu.ops.anchors import make_anchors

    feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchors, stride_t = make_anchors(feat_shapes, strides, 0.5)
    b = feats[0].shape[0]
    flat = jnp.concatenate([f.reshape(b, -1, f.shape[-1]) for f in feats], axis=1)
    return fused_decode_pallas(flat, anchors, stride_t, nc=nc, interpret=interpret)


def _dfl_expectation(box: jax.Array) -> jax.Array:
    """(ta, 64) side-major DFL logits -> (ta, 4) expected distances, MXU-form.

    The per-side softmax expectation sum(e*bins)/sum(e) is invariant to any
    constant subtracted uniformly within a side, so ONE global row max gives
    stability for all four sides — then both the numerator and denominator
    per side are (64 -> 4) contractions that run on the MXU instead of four
    masked lane-reduction passes on the VPU.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (4 * REG_MAX, 4), 0)
    side = jax.lax.broadcasted_iota(jnp.int32, (4 * REG_MAX, 4), 1)
    sel = (lane // REG_MAX == side).astype(jnp.float32)  # (64, 4) side indicator
    wsel = sel * jnp.remainder(lane, REG_MAX).astype(jnp.float32)  # bins per side

    e = jnp.exp(box - jnp.max(box, axis=-1, keepdims=True))  # (ta, 64)
    num = jnp.dot(e, wsel, preferred_element_type=jnp.float32)  # (ta, 4)
    den = jnp.dot(e, sel, preferred_element_type=jnp.float32)
    return num / den


def _decode_box_kernel(box_ref, cls_ref, anchors_ref, strides_ref, box_out, best_out):
    """Fused NMS pre-pass tile: DFL box decode to pixel xyxy + per-anchor
    max-class logit, one VMEM-resident pass.

    (1, TILE_A, 64) + (1, TILE_A, nc) -> (1, TILE_A, 4) xyxy + (1, TILE_A, 1)
    best logit. The class sigmoid is deliberately NOT computed here: sigmoid
    is monotonic, so candidate top-k downstream ranks raw logits identically
    and only the selected pre_k candidates ever get sigmoided.
    """
    d = _dfl_expectation(box_ref[0].astype(jnp.float32))  # (ta, 4) l,t,r,b
    ax = anchors_ref[:, 0]
    ay = anchors_ref[:, 1]
    s = strides_ref[:, 0]
    box_out[0] = jnp.stack(
        [(ax - d[:, 0]) * s, (ay - d[:, 1]) * s, (ax + d[:, 2]) * s, (ay + d[:, 3]) * s],
        axis=-1,
    )
    # (B, A, 1) layout: a trailing singleton keeps the block's sublane dim =
    # TILE_A (8-divisible) — a (1, TILE_A) block fails Mosaic's tiling check
    best_out[0] = jnp.max(cls_ref[0].astype(jnp.float32), axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("nc", "interpret"))
def fused_box_best_pallas(
    flat: jax.Array,  # (B, A, 4*REG_MAX + nc [+ extras]) raw head channels
    anchors: jax.Array,  # (A, 2) grid centers (feature units)
    strides: jax.Array,  # (A, 1)
    nc: int,
    interpret: bool = False,
):
    """(B, A, no) -> ((B, A, 4) xyxy pixels, (B, A) max class logit)."""
    B, A, _ = flat.shape
    box_logits = flat[..., : 4 * REG_MAX]
    cls_logits = flat[..., 4 * REG_MAX : 4 * REG_MAX + nc]
    pad = (-A) % TILE_A
    if pad:
        box_logits = jnp.pad(box_logits, ((0, 0), (0, pad), (0, 0)))
        # padded anchors get -inf best logit so they never become candidates
        cls_logits = jnp.pad(cls_logits, ((0, 0), (0, pad), (0, 0)), constant_values=-1e30)
        anchors = jnp.pad(anchors, ((0, pad), (0, 0)))
        strides = jnp.pad(strides, ((0, pad), (0, 0)), constant_values=1.0)
    Ap = A + pad
    grid = (B, Ap // TILE_A)

    boxes, best = pl.pallas_call(
        _decode_box_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE_A, 4 * REG_MAX), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, TILE_A, nc), lambda b, i: (b, i, 0)),
            pl.BlockSpec((TILE_A, 2), lambda b, i: (i, 0)),
            pl.BlockSpec((TILE_A, 1), lambda b, i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE_A, 4), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, TILE_A, 1), lambda b, i: (b, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Ap, 4), jnp.float32),
            jax.ShapeDtypeStruct((B, Ap, 1), jnp.float32),
        ),
        interpret=interpret,
    )(box_logits, cls_logits, anchors.astype(jnp.float32), strides.astype(jnp.float32))
    return boxes[:, :A], best[:, :A, 0]
