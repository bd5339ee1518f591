"""Task heads (reference: ultralytics/nn/modules/head.py).

The Detect head produces raw per-level maps; decoding (DFL integral + box
transform + sigmoid) is a separate pure function so the predictor can fuse
decode+NMS into one compiled graph (and later one Pallas kernel), and the
trainer can consume raw maps directly — mirroring the reference split between
Detect.forward (training) and Detect._inference (head.py:64-131).
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bsyolo_tpu.nn.modules import TORCH_INIT, ConvBN, DWConvBN, TConv, TDense, dfl_decode
from bsyolo_tpu.ops.anchors import dist2bbox, make_anchors

Array = jax.Array


def _bias_const(value: float):
    return lambda key, shape, dtype=jnp.float32: jnp.full(shape, value, dtype)


class Detect(nn.Module):
    """Anchor-free decoupled detect head (reference head.py:21-150).

    Returns the per-level raw maps (B, H, W, 4*reg_max + nc), box channels
    first (side-major DFL layout), matching the reference channel order so
    converted torch weights line up.
    """

    nc: int
    ch: Tuple[int, ...]
    strides: Tuple[int, ...]
    reg_max: int = 16
    legacy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[Array], train: bool = False) -> List[Array]:
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        outs = []
        for i, x in enumerate(feats):
            stride = self.strides[i]
            # box branch: Conv3x3 -> Conv3x3 -> 1x1 (bias=1.0, head.py:133-141)
            b = ConvBN(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
            b = ConvBN(c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(b, train)
            b = TConv(
                4 * self.reg_max,
                (1, 1),
                use_bias=True,
                bias_init=_bias_const(1.0),
                dtype=self.dtype,
                name=f"cv2_{i}_2",
            )(b)
            # cls branch (non-legacy): DW-separable stacks (head.py:46-57)
            if self.legacy:
                c = ConvBN(c3, 3, dtype=self.dtype, name=f"cv3_{i}_0")(x, train)
                c = ConvBN(c3, 3, dtype=self.dtype, name=f"cv3_{i}_1")(c, train)
            else:
                c = DWConvBN(x.shape[-1], 3, dtype=self.dtype, name=f"cv3_{i}_0_0")(x, train)
                c = ConvBN(c3, 1, dtype=self.dtype, name=f"cv3_{i}_0_1")(c, train)
                c = DWConvBN(c3, 3, dtype=self.dtype, name=f"cv3_{i}_1_0")(c, train)
                c = ConvBN(c3, 1, dtype=self.dtype, name=f"cv3_{i}_1_1")(c, train)
            cls_bias = math.log(5 / self.nc / (640 / stride) ** 2)
            c = TConv(
                self.nc,
                (1, 1),
                use_bias=True,
                bias_init=_bias_const(cls_bias),
                dtype=self.dtype,
                name=f"cv3_{i}_2",
            )(c)
            outs.append(jnp.concatenate([b, c], axis=-1))
        return outs


class Proto(nn.Module):
    """Mask prototype head for segmentation (reference block.py Proto:80)."""

    c_: int = 256
    c2: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        from bsyolo_tpu.nn.modules import upsample2x_nearest

        x = ConvBN(self.c_, 3, dtype=self.dtype, name="cv1")(x, train)
        # reference uses ConvTranspose2d(c_, c_, 2, 2, 0) with bias;
        # transpose_kernel=True matches torch's transposed-conv orientation
        # (kernel (k, k, out, in) = torch (in, out, k, k).transpose(2, 3, 1, 0))
        x = nn.ConvTranspose(
            self.c_, (2, 2), strides=(2, 2), use_bias=True, transpose_kernel=True,
            kernel_init=TORCH_INIT, dtype=self.dtype, name="upsample",
        )(x)
        x = ConvBN(self.c_, 3, dtype=self.dtype, name="cv2")(x, train)
        return ConvBN(self.c2, 1, dtype=self.dtype, name="cv3")(x, train)


class Segment(nn.Module):
    """Detect + mask-coefficient + proto head (reference head.py:175)."""

    nc: int
    ch: Tuple[int, ...]
    strides: Tuple[int, ...]
    nm: int = 32
    npr: int = 256
    reg_max: int = 16
    legacy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[Array], train: bool = False):
        proto = Proto(self.npr, self.nm, dtype=self.dtype, name="proto")(feats[0], train)
        det = Detect(
            self.nc, self.ch, self.strides, self.reg_max, self.legacy, dtype=self.dtype, name="detect"
        )(feats, train)
        c4 = max(self.ch[0] // 4, self.nm)
        mcs = []
        for i, x in enumerate(feats):
            m = ConvBN(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            m = ConvBN(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(m, train)
            m = TConv(self.nm, (1, 1), use_bias=True, dtype=self.dtype, name=f"cv4_{i}_2")(m)
            mcs.append(m)
        outs = [jnp.concatenate([d, m], axis=-1) for d, m in zip(det, mcs)]
        return {"feats": outs, "proto": proto}


class Pose(nn.Module):
    """Detect + keypoint regression head (reference head.py:230)."""

    nc: int
    ch: Tuple[int, ...]
    strides: Tuple[int, ...]
    kpt_shape: Tuple[int, int] = (17, 3)
    reg_max: int = 16
    legacy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[Array], train: bool = False):
        det = Detect(
            self.nc, self.ch, self.strides, self.reg_max, self.legacy, dtype=self.dtype, name="detect"
        )(feats, train)
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        c4 = max(self.ch[0] // 4, nk)
        outs = []
        for i, x in enumerate(feats):
            k = ConvBN(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            k = ConvBN(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(k, train)
            k = TConv(nk, (1, 1), use_bias=True, dtype=self.dtype, name=f"cv4_{i}_2")(k)
            outs.append(jnp.concatenate([det[i], k], axis=-1))
        return outs


class OBB(nn.Module):
    """Detect + rotation-angle head (reference head.py:200)."""

    nc: int
    ch: Tuple[int, ...]
    strides: Tuple[int, ...]
    ne: int = 1
    reg_max: int = 16
    legacy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[Array], train: bool = False):
        det = Detect(
            self.nc, self.ch, self.strides, self.reg_max, self.legacy, dtype=self.dtype, name="detect"
        )(feats, train)
        c4 = max(self.ch[0] // 4, self.ne)
        outs = []
        for i, x in enumerate(feats):
            a = ConvBN(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            a = ConvBN(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(a, train)
            a = TConv(self.ne, (1, 1), use_bias=True, dtype=self.dtype, name=f"cv4_{i}_2")(a)
            outs.append(jnp.concatenate([det[i], a], axis=-1))
        return outs


class Classify(nn.Module):
    """Classification head: conv -> GAP -> dropout -> linear (reference
    head.py:282-293; `drop` rate comes from cfg `dropout:` at train time)."""

    nc: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c_ = 1280
        x = ConvBN(c_, 1, 1, dtype=self.dtype, name="conv")(x, train)
        x = jnp.mean(x, axis=(1, 2))  # GAP
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return TDense(self.nc, dtype=self.dtype, name="linear")(x)


def decode_extras(
    feats: Sequence[Array],
    nc: int,
    reg_max: int = 16,
) -> Array:
    """Flatten per-anchor extra channels (mask coeffs / keypoints / angle):
    (B, A, extra) from per-level maps carrying 4*reg_max+nc+extra channels."""
    b = feats[0].shape[0]
    base = 4 * reg_max + nc
    return jnp.concatenate(
        [f.reshape(b, -1, f.shape[-1])[..., base:] for f in feats], axis=1
    )


def decode_keypoints(kpts_flat: Array, feats, strides, kpt_shape=(17, 3)) -> Array:
    """Decode raw keypoint maps to pixel coords (reference head.py Pose.kpts_decode).

    kpts_flat: (B, A, nk); returns (B, A, nkpt, ndim) with x, y in pixels and
    visibility passed through sigmoid.
    """
    from bsyolo_tpu.ops.anchors import make_anchors

    feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchors, stride_t = make_anchors(feat_shapes, strides, 0.5)
    b, a, nk = kpts_flat.shape
    nkpt, ndim = kpt_shape
    k = kpts_flat.reshape(b, a, nkpt, ndim).astype(jnp.float32)
    xy = (k[..., :2] * 2.0 + (anchors[None, :, None, :] - 0.5)) * stride_t[None, :, None, :]
    if ndim == 3:
        vis = jax.nn.sigmoid(k[..., 2:3])
        return jnp.concatenate([xy, vis], axis=-1)
    return xy


def decode_obb(
    feats: Sequence[Array],
    strides: Sequence[int],
    nc: int,
    reg_max: int = 16,
    ne: int = 1,
) -> Array:
    """Decode OBB head maps -> (B, A, 4+nc+1): xywh, scores, angle.

    Reference head.py OBB.forward:211-226: angle = (sigmoid(raw)-0.25)*pi,
    boxes decoded around the angle via dist2rbox.
    """
    import math as _math

    from bsyolo_tpu.ops.anchors import dist2rbox

    feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchors, stride_t = make_anchors(feat_shapes, strides, 0.5)
    b = feats[0].shape[0]
    flat = jnp.concatenate([f.reshape(b, -1, f.shape[-1]) for f in feats], axis=1)
    box_logits = flat[..., : 4 * reg_max]
    cls_logits = flat[..., 4 * reg_max : 4 * reg_max + nc]
    angle_raw = flat[..., 4 * reg_max + nc : 4 * reg_max + nc + ne]
    angle = (jax.nn.sigmoid(angle_raw.astype(jnp.float32)) - 0.25) * _math.pi
    dist = dfl_decode(box_logits, reg_max)
    rbox = dist2rbox(dist, angle, anchors[None]) * stride_t[None]
    return jnp.concatenate(
        [rbox, jax.nn.sigmoid(cls_logits.astype(jnp.float32)), angle], axis=-1
    )


def decode_detections(
    feats: Sequence[Array],
    strides: Sequence[int],
    nc: int,
    reg_max: int = 16,
) -> Array:
    """Decode raw Detect maps to (B, A, 4+nc): xywh pixels + sigmoid scores.

    Pure-function equivalent of Detect._inference (reference head.py:100-131):
    DFL softmax-expectation -> dist2bbox around cached anchors -> * stride.
    Anchors are built from static shapes at trace time.

    ``reg_max`` (DFL bin count) must be passed explicitly for non-16-bin
    heads (NASDetect: spec.reg_max == 17). It is deliberately NOT inferred
    from the channel count: Segment/Pose maps carry extra trailing channels
    (mask coeffs / keypoints), so (C - nc) // 4 would silently mis-split
    the box/cls layout for them.
    """
    feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchors, stride_t = make_anchors(feat_shapes, strides, 0.5)
    b = feats[0].shape[0]
    flat = jnp.concatenate(
        [f.reshape(b, -1, f.shape[-1]) for f in feats], axis=1
    )  # (B, A, 4*reg_max+nc)
    box_logits = flat[..., : 4 * reg_max]
    cls_logits = flat[..., 4 * reg_max : 4 * reg_max + nc]
    dist = dfl_decode(box_logits, reg_max)  # (B, A, 4)
    dbox = dist2bbox(dist, anchors[None], xywh=True, axis=-1) * stride_t[None]
    return jnp.concatenate([dbox, jax.nn.sigmoid(cls_logits.astype(jnp.float32))], axis=-1)


class v10Detect(nn.Module):
    """End-to-end (NMS-free) dual detect head from YOLOv10 (reference
    head.py v10Detect + Detect.forward_end2end:76).

    Two full head copies over the same neck features:
    - one2many (names cv2_*/cv3_*): trained with topk-10 TAL like Detect.
    - one2one (names one2one_cv2_*/one2one_cv3_*): trained with topk-1 TAL
      on stop-gradient features; drives NMS-free inference.
    Both use v10's light cls branch (DW 3x3 -> 1x1, twice, then 1x1 to nc).
    """

    nc: int
    ch: Tuple[int, ...]
    strides: Tuple[int, ...]
    reg_max: int = 16
    legacy: bool = False  # unused; kept for head-arg uniformity
    max_det: int = 300
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[Array], train: bool = False):
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))

        def branch(prefix: str, xs):
            outs = []
            for i, x in enumerate(xs):
                stride = self.strides[i]
                b = ConvBN(c2, 3, dtype=self.dtype, name=f"{prefix}cv2_{i}_0")(x, train)
                b = ConvBN(c2, 3, dtype=self.dtype, name=f"{prefix}cv2_{i}_1")(b, train)
                b = TConv(
                    4 * self.reg_max, (1, 1), use_bias=True, bias_init=_bias_const(1.0),
                    dtype=self.dtype, name=f"{prefix}cv2_{i}_2",
                )(b)
                c = ConvBN(x.shape[-1], 3, g=x.shape[-1], dtype=self.dtype,
                           name=f"{prefix}cv3_{i}_0_0")(x, train)
                c = ConvBN(c3, 1, dtype=self.dtype, name=f"{prefix}cv3_{i}_0_1")(c, train)
                c = ConvBN(c3, 3, g=c3, dtype=self.dtype, name=f"{prefix}cv3_{i}_1_0")(c, train)
                c = ConvBN(c3, 1, dtype=self.dtype, name=f"{prefix}cv3_{i}_1_1")(c, train)
                cls_bias = math.log(5 / self.nc / (640 / stride) ** 2)
                c = TConv(
                    self.nc, (1, 1), use_bias=True, bias_init=_bias_const(cls_bias),
                    dtype=self.dtype, name=f"{prefix}cv3_{i}_2",
                )(c)
                outs.append(jnp.concatenate([b, c], axis=-1))
            return outs

        one2many = branch("", feats)
        one2one = branch("one2one_", [jax.lax.stop_gradient(f) for f in feats])
        return {"one2many": one2many, "one2one": one2one}


def postprocess_e2e(preds: Array, max_det: int = 300, nc: int = 0) -> Array:
    """NMS-free selection from decoded one2one preds (reference
    Detect.postprocess head.py:151): per-anchor max class score top-k, then
    flat (anchor, class) top-k.

    preds: (B, A, 4+nc) xywh pixels + sigmoid scores -> (B, max_det, 6)
    xyxy/conf/cls in the same output convention as non_max_suppression
    (zero-score rows padded, cls -1).
    """
    from bsyolo_tpu.ops.boxes import xywh2xyxy

    b, a, _ = preds.shape
    if nc <= 0:
        nc = preds.shape[-1] - 4
    boxes = xywh2xyxy(preds[..., :4])
    scores = preds[..., 4:]
    k = min(max_det, a)
    best = jnp.max(scores, axis=-1)  # (B, A)
    _, idx = jax.lax.top_k(best, k)  # (B, k)
    boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)  # (B, k, 4)
    sub = jnp.take_along_axis(scores, idx[..., None], axis=1)  # (B, k, nc)
    conf, flat_idx = jax.lax.top_k(sub.reshape(b, -1), k)  # (B, k)
    anchor_rel = flat_idx // nc
    cls = (flat_idx % nc).astype(jnp.float32)
    out_boxes = jnp.take_along_axis(boxes, anchor_rel[..., None], axis=1)
    return jnp.concatenate([out_boxes, conf[..., None], cls[..., None]], axis=-1)


class WorldDetect(nn.Module):
    """Open-vocabulary detect head (reference head.py:307): Detect box branch
    + an embed branch scored against text features by a contrastive head.
    Class count at runtime = text.shape[1]."""

    nc: int
    ch: Tuple[int, ...]
    strides: Tuple[int, ...]
    embed: int = 512
    with_bn: bool = False
    reg_max: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[Array], text: Array, train: bool = False) -> List[Array]:
        from bsyolo_tpu.nn.modules import BNContrastiveHead, ContrastiveHead, ConvBN

        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        outs = []
        for i, x in enumerate(feats):
            b = ConvBN(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
            b = ConvBN(c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(b, train)
            b = TConv(
                4 * self.reg_max, (1, 1), use_bias=True, bias_init=_bias_const(1.0),
                dtype=self.dtype, name=f"cv2_{i}_2",
            )(b)
            e = ConvBN(c3, 3, dtype=self.dtype, name=f"cv3_{i}_0")(x, train)
            e = ConvBN(c3, 3, dtype=self.dtype, name=f"cv3_{i}_1")(e, train)
            e = TConv(self.embed, (1, 1), use_bias=True, dtype=self.dtype, name=f"cv3_{i}_2")(e)
            if self.with_bn:
                cls = BNContrastiveHead(self.embed, dtype=self.dtype, name=f"cv4_{i}")(e, text, train)
            else:
                cls = ContrastiveHead(dtype=self.dtype, name=f"cv4_{i}")(e, text, train)
            outs.append(jnp.concatenate([b, cls.astype(b.dtype)], axis=-1))
        return outs
