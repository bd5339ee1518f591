"""RT-DETR transformer components (reference nn/modules/transformer.py +
RTDETRDecoder, head.py).

TPU-first notes:
- multi-scale deformable attention is expressed as dense bilinear gathers
  per level (XLA gather + weighted sum) instead of the reference CUDA
  im2col kernel (DCNv4_op/flash_deform_* analog) — static shapes, fuses.
- the contrastive-denoising (CDN) group is built with STATIC shapes: the
  padded max_gt M replaces the reference's dynamic max(gt_groups), so the
  dn query count (2 * num_group * M) is a compile-time constant.
- torch-compatible parameter naming/layout (ma.in_proj_weight etc.) so
  reference .pt weights convert directly.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bsyolo_tpu.nn.modules import BN_EPS, BN_MOMENTUM, TConv, TDense

Array = jax.Array


def inverse_sigmoid(x: Array, eps: float = 1e-5) -> Array:
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.log(jnp.clip(x, eps, None) / jnp.clip(1 - x, eps, None))


class MultiheadAttention(nn.Module):
    """torch nn.MultiheadAttention-compatible MHSA (batch-first).

    Parameters are stored in the torch layout — ``in_proj_weight`` (3C, C),
    ``in_proj_bias`` (3C,), ``out_proj`` Dense — so converted checkpoints
    map 1:1.
    """

    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array, attn_mask: Optional[Array] = None) -> Array:
        C, H = self.dim, self.num_heads
        hd = C // H
        w = self.param("in_proj_weight", nn.initializers.xavier_uniform(), (3 * C, C))
        b = self.param("in_proj_bias", nn.initializers.zeros, (3 * C,))
        wq, wk, wv = jnp.split(w, 3, axis=0)
        bq, bk, bv = jnp.split(b, 3, axis=0)
        dt = q.dtype
        q = (q @ wq.T.astype(dt) + bq.astype(dt))
        k = (k @ wk.T.astype(dt) + bk.astype(dt))
        v = (v @ wv.T.astype(dt) + bv.astype(dt))
        B, Q, _ = q.shape
        K = k.shape[1]
        q = q.reshape(B, Q, H, hd)
        k = k.reshape(B, K, H, hd)
        v = v.reshape(B, K, H, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        attn = attn / math.sqrt(hd)
        if attn_mask is not None:
            # True = masked (torch bool semantics)
            attn = jnp.where(attn_mask[None, None], -1e9, attn)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, Q, C)
        return TDense(C, dtype=self.dtype, name="out_proj")(out)


def build_2d_sincos_pos_embed(w: int, h: int, embed_dim: int, temperature: float = 10000.0):
    """Reference AIFI.build_2d_sincos_position_embedding (transformer.py)."""
    grid_w, grid_h = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32), indexing="ij")
    pos_dim = embed_dim // 4
    omega = 1.0 / (temperature ** (np.arange(pos_dim, dtype=np.float32) / pos_dim))
    out_w = grid_w.flatten()[:, None] @ omega[None]
    out_h = grid_h.flatten()[:, None] @ omega[None]
    pe = np.concatenate([np.sin(out_w), np.cos(out_w), np.sin(out_h), np.cos(out_h)], axis=1)[None]
    return jnp.asarray(pe)  # (1, h*w, embed_dim) — (w-major flatten like torch)


class AIFI(nn.Module):
    """Intra-scale feature interaction: one transformer encoder layer over
    the flattened P5 map with 2D sin-cos positions (reference AIFI)."""

    cm: int = 2048
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        B, H, W, C = x.shape
        # torch flattens (B, C, H, W) -> (B, HW, C) row-major over (H, W);
        # NHWC reshape gives the same token order
        src = x.reshape(B, H * W, C)
        # the torch table is w-major while tokens are h-major; the reference
        # adds them by flat index anyway (transformer.py AIFI.forward), so we
        # reproduce that exact pairing for numeric parity
        pos = build_2d_sincos_pos_embed(W, H, C).astype(x.dtype)
        q = k = src + pos
        attn = MultiheadAttention(C, self.num_heads, dtype=self.dtype, name="ma")(q, k, src)
        src = nn.LayerNorm(dtype=self.dtype, name="norm1")(src + attn)
        ff = TDense(self.cm, dtype=self.dtype, name="fc1")(src)
        ff = TDense(C, dtype=self.dtype, name="fc2")(nn.gelu(ff, approximate=False))
        src = nn.LayerNorm(dtype=self.dtype, name="norm2")(src + ff)
        return src.reshape(B, H, W, C)


class MLP(nn.Module):
    """Simple multi-layer perceptron (reference transformer.py MLP)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = TDense(out, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return jax.nn.sigmoid(x) if self.sigmoid else x


def _bilinear_sample(value: Array, grid: Array) -> Array:
    """grid_sample(mode=bilinear, padding=zeros, align_corners=False).

    value: (N, H, W, C); grid: (N, Q, P, 2) in [-1, 1] -> (N, Q, P, C)
    """
    N, H, W, C = value.shape
    x = (grid[..., 0] + 1.0) * (W / 2.0) - 0.5
    y = (grid[..., 1] + 1.0) * (H / 2.0) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(yi, xi):
        ok = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yi = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        flat = value.reshape(N, H * W, C)
        idx = yi * W + xi  # (N, Q, P)
        g = jnp.take_along_axis(flat, idx.reshape(N, -1, 1), axis=1).reshape(idx.shape + (C,))
        return g * ok[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy) + v10 * (1 - wx) * wy + v11 * wx * wy
    )


def ms_deform_attn_sample(
    value: Array,  # (B, len_v, H, hd)
    shapes: Sequence[Tuple[int, int]],
    locations: Array,  # (B, Q, H, L, P, 2) in [0, 1]
    weights: Array,  # (B, Q, H, L, P)
) -> Array:
    """Dense JAX form of multi_scale_deformable_attn_pytorch
    (reference nn/modules/utils.py:42)."""
    B, _, H, hd = value.shape
    Q = locations.shape[1]
    grids = 2 * locations - 1
    start = 0
    out = jnp.zeros((B, Q, H, hd), jnp.float32)
    for lvl, (h, w) in enumerate(shapes):
        v = value[:, start : start + h * w]  # (B, hw, H, hd)
        start += h * w
        v = v.transpose(0, 2, 1, 3).reshape(B * H, h, w, hd)
        g = grids[:, :, :, lvl].transpose(0, 2, 1, 3, 4).reshape(B * H, Q, -1, 2)  # (BH, Q, P, 2)
        sampled = _bilinear_sample(v, g)  # (BH, Q, P, hd)
        wl = weights[:, :, :, lvl].transpose(0, 2, 1, 3).reshape(B * H, Q, -1)  # (BH, Q, P)
        acc = jnp.sum(sampled * wl[..., None], axis=2)  # (BH, Q, hd)
        out = out + acc.reshape(B, H, Q, hd).transpose(0, 2, 1, 3)
    return out.reshape(B, Q, H * hd)


class MSDeformAttn(nn.Module):
    """Multiscale deformable attention (reference transformer.py MSDeformAttn)."""

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dtype: Any = jnp.float32

    def _offset_bias_init(self, key, shape, dtype=jnp.float32):
        """Reference _reset_parameters: ring-of-directions init."""
        thetas = np.arange(self.n_heads, dtype=np.float32) * (2.0 * np.pi / self.n_heads)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid[:, None, None, :], (1, self.n_levels, self.n_points, 1))
        for i in range(self.n_points):
            grid[:, :, i, :] *= i + 1
        return jnp.asarray(grid.reshape(-1), dtype)

    @nn.compact
    def __call__(
        self,
        query: Array,  # (B, Q, C)
        refer_bbox: Array,  # (B, Q, L, 2|4) normalized
        value: Array,  # (B, len_v, C)
        shapes: Sequence[Tuple[int, int]],
    ) -> Array:
        B, Q = query.shape[:2]
        len_v = value.shape[1]
        H, L, P = self.n_heads, self.n_levels, self.n_points
        value = TDense(self.d_model, dtype=self.dtype, name="value_proj")(value)
        value = value.reshape(B, len_v, H, self.d_model // H)
        off = TDense(
            H * L * P * 2, kernel_init=nn.initializers.zeros, bias_init=self._offset_bias_init,
            dtype=self.dtype, name="sampling_offsets",
        )(query).reshape(B, Q, H, L, P, 2)
        w = TDense(
            H * L * P, kernel_init=nn.initializers.zeros, dtype=self.dtype,
            name="attention_weights",
        )(query).reshape(B, Q, H, L * P)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).reshape(B, Q, H, L, P)
        num_points = refer_bbox.shape[-1]
        rb = refer_bbox.astype(jnp.float32)
        off = off.astype(jnp.float32)
        if num_points == 2:
            normalizer = jnp.asarray([[wd, ht] for ht, wd in shapes], jnp.float32)  # flip(-1)
            loc = rb[:, :, None, :, None, :] + off / normalizer[None, None, None, :, None, :]
        else:
            loc = rb[:, :, None, :, None, :2] + off / P * rb[:, :, None, :, None, 2:] * 0.5
        out = ms_deform_attn_sample(value.astype(jnp.float32), shapes, loc, w)
        return TDense(self.d_model, dtype=self.dtype, name="output_proj")(out.astype(query.dtype))


class DeformableTransformerDecoderLayer(nn.Module):
    """Reference DeformableTransformerDecoderLayer (self-attn + deform
    cross-attn + FFN)."""

    d_model: int = 256
    n_heads: int = 8
    d_ffn: int = 1024
    n_levels: int = 4
    n_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, embed, refer_bbox, feats, shapes, attn_mask=None, query_pos=None, train=False):
        q = k = embed if query_pos is None else embed + query_pos
        tgt = MultiheadAttention(self.d_model, self.n_heads, dtype=self.dtype, name="self_attn")(
            q, k, embed, attn_mask=attn_mask
        )
        embed = nn.LayerNorm(dtype=self.dtype, name="norm1")(embed + tgt)
        tgt = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points, dtype=self.dtype,
            name="cross_attn",
        )(embed if query_pos is None else embed + query_pos, refer_bbox[:, :, None], feats, shapes)
        embed = nn.LayerNorm(dtype=self.dtype, name="norm2")(embed + tgt)
        ff = TDense(self.d_ffn, dtype=self.dtype, name="linear1")(embed)
        ff = TDense(self.d_model, dtype=self.dtype, name="linear2")(nn.relu(ff))
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(embed + ff)


def static_cdn_group(
    gt_cls: Array,  # (B, M) int
    gt_bboxes: Array,  # (B, M, 4) normalized xywh
    gt_mask: Array,  # (B, M) validity
    class_embed: Array,  # (nc, hd)
    num_classes: int,
    num_queries: int,
    rng: Array,
    num_dn: int = 100,
    cls_noise_ratio: float = 0.5,
    box_noise_scale: float = 1.0,
):
    """Static-shape contrastive denoising group (reference
    models/utils/ops.py get_cdn_group).

    The reference sizes groups by the batch max gt count; here the padded
    max_gt M is the group stride, so every shape is a compile-time constant.
    Padded gt slots produce zero embeddings and are excluded from the loss
    via the returned dn validity mask.
    """
    from bsyolo_tpu.ops.boxes import xywh2xyxy, xyxy2xywh

    B, M = gt_cls.shape
    num_group = max(num_dn // M, 1)
    n_half = num_group * M
    total = 2 * n_half  # positives then negatives

    # tile gt across groups: layout [g0_pos(M) ... g{G-1}_pos? ] — reference
    # interleaves pos/neg per group as [pos(M), neg(M)] * G along the dn axis
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    cls_t = jnp.tile(gt_cls, (1, 2 * num_group))  # (B, total)
    box_t = jnp.tile(gt_bboxes, (1, 2 * num_group, 1))
    mask_t = jnp.tile(gt_mask, (1, 2 * num_group)).astype(bool)
    # group-local negative flag: second half of each group pair
    slot = jnp.arange(total) // M  # 0..2G-1
    is_neg = (slot % 2) == 1

    if cls_noise_ratio > 0:
        flip = jax.random.uniform(k1, (B, total)) < (cls_noise_ratio * 0.5)
        rand_cls = jax.random.randint(k2, (B, total), 0, num_classes)
        cls_t = jnp.where(flip & mask_t, rand_cls, cls_t)

    if box_noise_scale > 0:
        known = xywh2xyxy(box_t)
        diff = jnp.tile(box_t[..., 2:] * 0.5, (1, 1, 2)) * box_noise_scale
        sign = jax.random.randint(k3, box_t.shape, 0, 2) * 2.0 - 1.0
        part = jax.random.uniform(k4, box_t.shape)
        part = part + is_neg[None, :, None].astype(part.dtype)
        known = known + sign * part * diff
        known = jnp.clip(known, 0.0, 1.0)
        box_t = xyxy2xywh(known)
    dn_bbox = inverse_sigmoid(box_t, eps=1e-6)

    dn_embed = class_embed[jnp.clip(cls_t, 0, num_classes - 1)] * mask_t[..., None]

    # attention mask (True = blocked): queries can't see dn; dn groups can't
    # see each other (reference ops.py attn_mask construction)
    tgt = total + num_queries
    qi = jnp.arange(tgt)
    gi = jnp.where(qi < total, qi // (2 * M), -1)  # group id per dn slot
    is_dn_row = (qi < total)[:, None]
    is_dn_col = (qi < total)[None, :]
    same_group = gi[:, None] == gi[None, :]
    attn_mask = (is_dn_row & is_dn_col & ~same_group) | (~is_dn_row & is_dn_col)

    dn_meta = {"num_group": num_group, "num_dn": total, "M": M, "is_neg": is_neg}
    return dn_embed, dn_bbox, attn_mask, mask_t, dn_meta


class RTDETRDecoder(nn.Module):
    """RT-DETR hybrid encoder-selected-query deformable decoder
    (reference head.py RTDETRDecoder)."""

    nc: int = 80
    ch: Tuple[int, ...] = (512, 1024, 2048)
    hd: int = 256
    nq: int = 300
    ndp: int = 4
    nh: int = 8
    ndl: int = 6
    d_ffn: int = 1024
    eval_idx: int = -1
    num_denoising: int = 100
    label_noise_ratio: float = 0.5
    box_noise_scale: float = 1.0
    learnt_init_query: bool = False
    dtype: Any = jnp.float32

    def _cls_bias(self):
        # bias_init_with_prob(0.01) / 80 * nc
        return float(-np.log((1 - 0.01) / 0.01) / 80 * self.nc)

    @nn.compact
    def __call__(self, x: Sequence[Array], train: bool = False, targets=None):
        from bsyolo_tpu.nn.modules import BN_EPS, BN_MOMENTUM

        nl = len(self.ch)
        feats_l = []
        shapes = []
        for i, f in enumerate(x):
            p = TConv(self.hd, (1, 1), use_bias=False, dtype=self.dtype, name=f"input_proj_{i}_0")(f)
            p = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
                dtype=self.dtype, name=f"input_proj_{i}_1",
            )(p)
            B, H, W, C = p.shape
            shapes.append((H, W))
            feats_l.append(p.reshape(B, H * W, C))
        feats = jnp.concatenate(feats_l, axis=1)  # (B, sum hw, hd)
        B = feats.shape[0]
        nq_eff = min(self.nq, feats.shape[1])  # tiny test images have < nq anchors

        class_embed = self.param(
            "denoising_class_embed",
            nn.initializers.normal(1.0),
            (self.nc, self.hd),
        )

        dn_embed = dn_bbox = attn_mask = dn_valid = dn_meta = None
        if train and targets is not None and self.num_denoising > 0:
            rng = self.make_rng("dn")
            dn_embed, dn_bbox, attn_mask, dn_valid, dn_meta = static_cdn_group(
                targets["cls"].astype(jnp.int32),
                targets["bboxes"].astype(jnp.float32),
                targets["mask"],
                class_embed,
                self.nc,
                nq_eff,
                rng,
                self.num_denoising,
                self.label_noise_ratio,
                self.box_noise_scale,
            )

        # anchors (static per shape set)
        anchors = []
        for i, (h, w) in enumerate(shapes):
            gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
            xy = (jnp.stack([gx, gy], -1) + 0.5) / jnp.asarray([w, h], jnp.float32)
            wh = jnp.full((h, w, 2), 0.05 * (2.0**i), jnp.float32)
            anchors.append(jnp.concatenate([xy, wh], -1).reshape(1, h * w, 4))
        anchors = jnp.concatenate(anchors, 1)
        eps = 1e-2
        valid = jnp.all((anchors > eps) & (anchors < 1 - eps), axis=-1, keepdims=True)
        anchors = jnp.log(anchors / (1 - anchors))
        anchors = jnp.where(valid, anchors, jnp.inf)

        fmem = TDense(self.hd, dtype=self.dtype, name="enc_output_0")(
            valid.astype(feats.dtype) * feats
        )
        fmem = nn.LayerNorm(dtype=self.dtype, name="enc_output_1")(fmem)
        enc_scores_all = TDense(
            self.nc, bias_init=nn.initializers.constant(self._cls_bias()), dtype=self.dtype,
            name="enc_score_head",
        )(fmem)

        k = nq_eff
        best = jnp.max(enc_scores_all.astype(jnp.float32), axis=-1)  # (B, A)
        _, topk = jax.lax.top_k(best, k)  # (B, k)
        top_feats = jnp.take_along_axis(fmem, topk[..., None], axis=1)
        top_anchors = jnp.take_along_axis(jnp.broadcast_to(anchors, (B,) + anchors.shape[1:]), topk[..., None], axis=1)

        enc_bbox_delta = MLP(self.hd, 4, 3, dtype=self.dtype, name="enc_bbox_head")(top_feats)
        refer_bbox = enc_bbox_delta + top_anchors
        enc_bboxes = jax.nn.sigmoid(refer_bbox)
        enc_scores = jnp.take_along_axis(enc_scores_all, topk[..., None], axis=1)

        embeddings = top_feats
        if self.learnt_init_query:
            tgt_embed = self.param("tgt_embed", nn.initializers.xavier_uniform(), (self.nq, self.hd))
            embeddings = jnp.broadcast_to(tgt_embed[None, :k], (B, k, self.hd))
        if train:
            refer_bbox = jax.lax.stop_gradient(refer_bbox)
            if not self.learnt_init_query:
                embeddings = jax.lax.stop_gradient(embeddings)
        if dn_embed is not None:
            embeddings = jnp.concatenate([dn_embed.astype(embeddings.dtype), embeddings], axis=1)
            refer_bbox = jnp.concatenate([dn_bbox.astype(refer_bbox.dtype), refer_bbox], axis=1)

        # decoder (loop lives here so bbox/score heads keep top-level names)
        refer = jax.nn.sigmoid(refer_bbox)
        dec_bboxes: List[Array] = []
        dec_scores: List[Array] = []
        output = embeddings
        last_refined = None
        pos_mlp = MLP(2 * self.hd, self.hd, 2, dtype=self.dtype, name="query_pos_head")
        for i in range(self.ndl):
            pos = pos_mlp(refer)
            output = DeformableTransformerDecoderLayer(
                self.hd, self.nh, self.d_ffn, nl, self.ndp, dtype=self.dtype, name=f"decoder_layers_{i}"
            )(output, refer, feats, shapes, attn_mask=attn_mask, query_pos=pos, train=train)
            bbox_delta = MLP(self.hd, 4, 3, dtype=self.dtype, name=f"dec_bbox_head_{i}")(output)
            refined = jax.nn.sigmoid(bbox_delta + inverse_sigmoid(refer))
            score = TDense(
                self.nc, bias_init=nn.initializers.constant(self._cls_bias()), dtype=self.dtype,
                name=f"dec_score_head_{i}",
            )(output)
            if train:
                dec_scores.append(score)
                if i == 0:
                    dec_bboxes.append(refined)
                else:
                    dec_bboxes.append(jax.nn.sigmoid(bbox_delta + inverse_sigmoid(last_refined)))
            elif i == (self.ndl + self.eval_idx if self.eval_idx < 0 else self.eval_idx):
                dec_scores.append(score)
                dec_bboxes.append(refined)
                break
            last_refined = refined
            refer = jax.lax.stop_gradient(refined) if train else refined

        db = jnp.stack(dec_bboxes)  # (L, B, Q, 4)
        ds = jnp.stack(dec_scores)  # (L, B, Q, nc)
        out = {
            "dec_bboxes": db,
            "dec_scores": ds,
            "enc_bboxes": enc_bboxes,
            "enc_scores": enc_scores,
        }
        if dn_meta is not None:
            out["dn_meta"] = dn_meta
            out["dn_valid"] = dn_valid
        return out


def decode_rtdetr(outputs, img_hw: Tuple[int, int], conf_thres: float = 0.25, max_det: int = 300):
    """Eval-mode RTDETRDecoder outputs -> (B, max_det, 6) xyxy/conf/cls in
    pixels, zero-padded rows (the repo-wide NMS output convention; NMS-free
    like reference RTDETRPredictor.postprocess, models/rtdetr/predict.py)."""
    from bsyolo_tpu.ops.boxes import xywh2xyxy

    bb = outputs["dec_bboxes"][-1].astype(jnp.float32)  # (B, Q, 4) normalized
    sc = jax.nn.sigmoid(outputs["dec_scores"][-1].astype(jnp.float32))  # (B, Q, nc)
    h, w = img_hw
    boxes = xywh2xyxy(bb) * jnp.asarray([w, h, w, h], jnp.float32)
    conf = jnp.max(sc, axis=-1)
    cls = jnp.argmax(sc, axis=-1).astype(jnp.float32)
    k = min(max_det, conf.shape[1])
    top_conf, idx = jax.lax.top_k(conf, k)
    top_boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)
    top_cls = jnp.take_along_axis(cls, idx, axis=1)
    ok = top_conf > conf_thres
    out = jnp.concatenate(
        [
            jnp.where(ok[..., None], top_boxes, 0.0),
            jnp.where(ok, top_conf, 0.0)[..., None],
            jnp.where(ok, top_cls, -1.0)[..., None],
        ],
        axis=-1,
    )
    if max_det > k:
        pad = jnp.zeros((out.shape[0], max_det - k, 6), out.dtype)
        pad = pad.at[..., 5].set(-1.0)
        out = jnp.concatenate([out, pad], axis=1)
    return out
