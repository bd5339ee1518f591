"""SAM2 image-segmentation path, TPU-first flax
(reference models/sam/modules/{encoders.py Hiera/FpnNeck/ImageEncoder,
blocks.py MultiScaleBlock/MultiScaleAttention/PositionEmbeddingSine,
decoders.py SAM2MaskDecoder, sam.py SAM2Model image heads}).

Scope: the full promptable IMAGE pipeline — Hiera trunk, FPN neck with sine
position encodings, the shared PromptEncoder, and SAM2MaskDecoder with
object-score token, high-resolution skip features, and stability-based
dynamic multimask selection. The streaming-video memory branch lives in
sam2_video.py (see SAM2_VIDEO_NOTE).

Everything static-shape: window partition pads are compile-time, the
stability selection is a jnp.where, and prompts use the same packed
labelled-point layout as SAM1 (modules.py PromptEncoder).
Parameter names line up with official sam2*.pt state_dicts
(image_encoder.trunk/neck, sam_prompt_encoder, sam_mask_decoder).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bsyolo_tpu.models.sam.modules import (
    MLP,
    LayerNorm2d,
    PromptEncoder,
    TwoWayTransformer,
    window_partition,
    window_unpartition,
)

Array = jax.Array

SAM2_VIDEO_NOTE = (
    "SAM2 video tracking lives in sam2_video.py (RoPE memory attention, "
    "memory encoder, fixed-size ring bank, past-frame object-pointer tokens "
    "with fixed no-obj blend, streaming SAM2VideoPredictor)."
)


# --------------------------------------------------------------------------
# Hiera trunk
# --------------------------------------------------------------------------


class MultiScaleAttention(nn.Module):
    """Windowed MHSA with optional q max-pool downsampling
    (reference blocks.py:503)."""

    dim_out: int
    num_heads: int
    q_stride: Optional[Tuple[int, int]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, H, W, _ = x.shape
        nh = self.num_heads
        hd = self.dim_out // nh
        qkv = nn.Dense(3 * self.dim_out, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, nh, hd)
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # (B, HW, nh, hd)
        if self.q_stride is not None:
            sh, sw = self.q_stride
            qm = q.reshape(B, H, W, nh * hd)
            qm = nn.max_pool(qm, (sh, sw), strides=(sh, sw))
            H, W = qm.shape[1], qm.shape[2]
            q = qm.reshape(B, H * W, nh, hd)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        attn = jnp.einsum("bnqc,bnkc->bnqk", q * (hd**-0.5), k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bnqk,bnkc->bnqc", attn, v).transpose(0, 2, 1, 3).reshape(B, H, W, self.dim_out)
        return nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(out)


class MultiScaleBlock(nn.Module):
    """Hiera block: windowed attention + optional q-pool stage shift
    (reference blocks.py:583)."""

    dim: int
    dim_out: int
    num_heads: int
    mlp_ratio: float = 4.0
    q_stride: Optional[Tuple[int, int]] = None
    window_size: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.dim != self.dim_out:
            shortcut = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(x)
            if self.q_stride is not None:
                sh, sw = self.q_stride
                shortcut = nn.max_pool(shortcut, (sh, sw), strides=(sh, sw))
        ws = self.window_size
        if ws > 0:
            H, W = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, ws)
        x = MultiScaleAttention(
            self.dim_out, self.num_heads, self.q_stride, dtype=self.dtype, name="attn"
        )(x)
        if self.q_stride is not None:
            # window grid shrank with the q-pool (reference blocks.py:664)
            ws = self.window_size // self.q_stride[0]
            H, W = shortcut.shape[1], shortcut.shape[2]
            pad_hw = (H + (-H) % max(ws, 1), W + (-W) % max(ws, 1))
        if self.window_size > 0:
            x = window_unpartition(x, ws, pad_hw, (H, W))
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = MLP(int(self.dim_out * self.mlp_ratio), self.dim_out, 2, act="gelu",
                dtype=self.dtype, name="mlp")(y)
        return x + y


class Hiera(nn.Module):
    """Hierarchical ViT trunk -> per-stage feature maps
    (reference encoders.py:645)."""

    embed_dim: int = 96
    num_heads: int = 1
    q_pool: int = 3
    q_stride: Tuple[int, int] = (2, 2)
    stages: Tuple[int, ...] = (2, 3, 16, 3)
    dim_mul: float = 2.0
    head_mul: float = 2.0
    window_pos_embed_bkg_spatial_size: Tuple[int, int] = (14, 14)
    window_spec: Tuple[int, ...] = (8, 4, 14, 7)
    global_att_blocks: Tuple[int, ...] = (12, 16, 20)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        depth = sum(self.stages)
        stage_ends = [sum(self.stages[: i + 1]) - 1 for i in range(len(self.stages))]
        q_pool_blocks = [e + 1 for e in stage_ends[:-1]][: self.q_pool]

        x = nn.Conv(
            self.embed_dim, (7, 7), strides=(4, 4), padding=((3, 3), (3, 3)),
            dtype=self.dtype, name="patch_embed_proj",
        )(x)
        B, H, W, _ = x.shape
        # windowed absolute positions (reference _get_pos_embed): a bicubic
        # background table + a tiled window table
        bs = self.window_pos_embed_bkg_spatial_size
        pe_bg = self.param("pos_embed", nn.initializers.zeros, (1, bs[0], bs[1], self.embed_dim))
        w0 = self.window_spec[0]
        pe_win = self.param("pos_embed_window", nn.initializers.zeros, (1, w0, w0, self.embed_dim))
        pe = jax.image.resize(pe_bg.astype(jnp.float32), (1, H, W, self.embed_dim), "cubic")
        pe = pe + jnp.tile(pe_win.astype(jnp.float32), (1, H // w0, W // w0, 1))
        x = x + pe.astype(x.dtype)

        dim = self.embed_dim
        heads = self.num_heads
        cur_stage = 1
        outputs: List[Array] = []
        for i in range(depth):
            dim_out = dim
            window_size = self.window_spec[cur_stage - 1]
            if i in self.global_att_blocks:
                window_size = 0
            if i - 1 in stage_ends:
                dim_out = int(dim * self.dim_mul)
                heads = int(heads * self.head_mul)
                cur_stage += 1
            x = MultiScaleBlock(
                dim, dim_out, heads,
                q_stride=self.q_stride if i in q_pool_blocks else None,
                window_size=window_size, dtype=self.dtype, name=f"blocks_{i}",
            )(x)
            dim = dim_out
            if i in stage_ends:
                outputs.append(x)
        return outputs  # strides 4, 8, 16, 32


# --------------------------------------------------------------------------
# FPN neck + sine positions
# --------------------------------------------------------------------------


def position_embedding_sine(h: int, w: int, dim: int, temperature: float = 10000.0) -> Array:
    """Normalized 2D sine PE, (1, h, w, dim) (reference blocks.py:698 forward)."""
    npf = dim // 2
    eps = 1e-6
    y = (jnp.arange(h, dtype=jnp.float32) + 1.0)[:, None].repeat(w, 1)
    x = (jnp.arange(w, dtype=jnp.float32) + 1.0)[None, :].repeat(h, 0)
    y = y / (h + eps) * (2 * math.pi)
    x = x / (w + eps) * (2 * math.pi)
    dim_t = jnp.arange(npf, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * (dim_t // 2) / npf)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = jnp.stack([jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2])], axis=-1).reshape(h, w, npf)
    py = jnp.stack([jnp.sin(py[..., 0::2]), jnp.cos(py[..., 1::2])], axis=-1).reshape(h, w, npf)
    return jnp.concatenate([py, px], axis=-1)[None]


class FpnNeck(nn.Module):
    """1x1 laterals + nearest top-down fusion on selected levels
    (reference encoders.py:501; sam2 config: top_down_levels=(2, 3),
    interp nearest)."""

    d_model: int = 256
    backbone_channel_list: Tuple[int, ...] = (768, 384, 192, 96)  # high->low stride? (low res first)
    fpn_top_down_levels: Tuple[int, ...] = (2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[Array]) -> Tuple[List[Array], List[Array]]:
        n = len(xs) - 1
        out: List[Optional[Array]] = [None] * len(xs)
        pos: List[Optional[Array]] = [None] * len(xs)
        prev = None
        for i in range(n, -1, -1):  # top-down: lowest resolution first
            lat = nn.Conv(self.d_model, (1, 1), dtype=self.dtype, name=f"convs_{n - i}_conv")(xs[i])
            if i in self.fpn_top_down_levels and prev is not None:
                B, H, W, C = prev.shape
                td = jax.image.resize(prev.astype(jnp.float32), (B, H * 2, W * 2, C), "nearest")
                x = lat + td.astype(lat.dtype)
            else:
                x = lat
            prev = x
            out[i] = x
            pos[i] = position_embedding_sine(x.shape[1], x.shape[2], self.d_model).astype(x.dtype)
        return out, pos


# --------------------------------------------------------------------------
# SAM2 mask decoder
# --------------------------------------------------------------------------


class SAM2MaskDecoder(nn.Module):
    """MaskDecoder + object-score token + high-res skips + stability-based
    multimask selection (reference decoders.py:176)."""

    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    transformer_depth: int = 2
    transformer_mlp_dim: int = 2048
    transformer_num_heads: int = 8
    use_high_res_features: bool = True
    iou_prediction_use_sigmoid: bool = True
    pred_obj_scores: bool = True
    pred_obj_scores_mlp: bool = True
    dynamic_multimask_via_stability: bool = True
    dynamic_multimask_stability_delta: float = 0.05
    dynamic_multimask_stability_thresh: float = 0.98
    dtype: Any = jnp.float32

    def setup(self):
        # high-res skip projections (decoders.py:289); defined in setup so
        # SAM2Model.encode can call high_res_convs outside __call__
        self.conv_s0 = nn.Conv(self.transformer_dim // 8, (1, 1), dtype=self.dtype, name="conv_s0")
        self.conv_s1 = nn.Conv(self.transformer_dim // 4, (1, 1), dtype=self.dtype, name="conv_s1")

    def high_res_convs(self, s0: Array, s1: Array) -> Tuple[Array, Array]:
        """conv_s0/conv_s1 on the stride-4/8 neck features (applied by
        SAM2Model.forward_image, sam.py:601)."""
        return self.conv_s0(s0), self.conv_s1(s1)

    @nn.compact
    def __call__(
        self,
        image_embeddings: Array,  # (B, eh, ew, C)
        image_pe: Array,  # (1, eh, ew, C)
        sparse_prompt: Array,  # (B, P, C)
        dense_prompt: Array,  # (B, eh, ew, C)
        multimask_output: bool = True,
        high_res_features: Optional[Tuple[Array, Array]] = None,  # (s0 C/8, s1 C/4)
    ):
        nm = self.num_multimask_outputs + 1
        init = nn.initializers.normal(1.0)
        iou_token = self.param("iou_token", init, (1, self.transformer_dim))
        mask_tokens = self.param("mask_tokens", init, (nm, self.transformer_dim))
        toks = [iou_token, mask_tokens]
        s = 0
        if self.pred_obj_scores:
            obj_token = self.param("obj_score_token", init, (1, self.transformer_dim))
            toks = [obj_token] + toks
            s = 1
        B = sparse_prompt.shape[0]
        out_tokens = jnp.broadcast_to(
            jnp.concatenate(toks, axis=0)[None], (B, s + 1 + nm, self.transformer_dim)
        ).astype(sparse_prompt.dtype)
        tokens = jnp.concatenate([out_tokens, sparse_prompt], axis=1)

        src = image_embeddings + dense_prompt
        hs, keys = TwoWayTransformer(
            self.transformer_depth, self.transformer_dim, self.transformer_num_heads,
            self.transformer_mlp_dim, dtype=self.dtype, name="transformer",
        )(src, image_pe, tokens)
        iou_out = hs[:, s]
        mask_out = hs[:, s + 1 : s + 1 + nm]

        eh, ew = src.shape[1], src.shape[2]
        up = keys.reshape(B, eh, ew, self.transformer_dim)
        dc1 = nn.ConvTranspose(
            self.transformer_dim // 4, (2, 2), strides=(2, 2), padding="VALID",
            transpose_kernel=True, dtype=self.dtype, name="output_upscaling_0",
        )(up)
        if self.use_high_res_features and high_res_features is not None:
            dc1 = dc1 + high_res_features[1]
        u = nn.gelu(LayerNorm2d(dtype=self.dtype, name="output_upscaling_1")(dc1), approximate=False)
        dc2 = nn.ConvTranspose(
            self.transformer_dim // 8, (2, 2), strides=(2, 2), padding="VALID",
            transpose_kernel=True, dtype=self.dtype, name="output_upscaling_3",
        )(u)
        if self.use_high_res_features and high_res_features is not None:
            dc2 = dc2 + high_res_features[0]
        up_emb = nn.gelu(dc2, approximate=False)

        hyper = jnp.stack(
            [
                MLP(self.transformer_dim, self.transformer_dim // 8, 3, dtype=self.dtype,
                    name=f"output_hypernetworks_mlps_{i}")(mask_out[:, i])
                for i in range(nm)
            ],
            axis=1,
        )
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper, up_emb, preferred_element_type=jnp.float32)
        iou_pred = MLP(
            self.iou_head_hidden_dim, nm, self.iou_head_depth,
            sigmoid=self.iou_prediction_use_sigmoid, dtype=self.dtype, name="iou_prediction_head",
        )(iou_out).astype(jnp.float32)

        if self.pred_obj_scores:
            if self.pred_obj_scores_mlp:
                obj_logits = MLP(self.transformer_dim, 1, 3, dtype=self.dtype,
                                 name="pred_obj_score_head")(hs[:, 0]).astype(jnp.float32)
            else:
                obj_logits = nn.Dense(1, dtype=self.dtype, name="pred_obj_score_head")(hs[:, 0]).astype(jnp.float32)
        else:
            obj_logits = 10.0 * jnp.ones((B, 1), jnp.float32)

        if multimask_output:
            # best-IoU multimask token as the pointer source (reference
            # use_multimask_token_for_obj_ptr=True in sam2 configs)
            best = jnp.argmax(iou_pred[:, 1:], axis=-1) + 1
            sam_token = jnp.take_along_axis(mask_out, best[:, None, None], axis=1)[:, 0]
            return masks[:, 1:], iou_pred[:, 1:], obj_logits, sam_token
        # single-mask path: token 0 (reference sam_tokens_out[:, 0:1])
        sam_token = mask_out[:, 0]
        if self.dynamic_multimask_via_stability:
            masks0, iou0 = self._stability_select(masks, iou_pred)
            return masks0, iou0, obj_logits, sam_token
        return masks[:, :1], iou_pred[:, :1], obj_logits, sam_token

    def _stability_select(self, masks: Array, iou_pred: Array):
        """Swap in the best multimask when the single-mask output is unstable
        (reference decoders.py:464 _dynamic_multimask_via_stability)."""
        d = self.dynamic_multimask_stability_delta
        m0 = masks[:, 0]
        hi = jnp.sum((m0 > d).astype(jnp.float32), axis=(-1, -2))
        lo = jnp.sum((m0 > -d).astype(jnp.float32), axis=(-1, -2))
        stability = jnp.where(lo > 0, hi / jnp.maximum(lo, 1.0), 1.0)
        stable = stability >= self.dynamic_multimask_stability_thresh  # (B,)
        best = jnp.argmax(iou_pred[:, 1:], axis=-1) + 1  # (B,)
        mb = jnp.take_along_axis(masks, best[:, None, None, None], axis=1)[:, 0]
        ib = jnp.take_along_axis(iou_pred, best[:, None], axis=1)
        out_m = jnp.where(stable[:, None, None], m0, mb)[:, None]
        out_i = jnp.where(stable[:, None], iou_pred[:, :1], ib)
        return out_m, out_i


# --------------------------------------------------------------------------
# full model
# --------------------------------------------------------------------------


class SAM2Model(nn.Module):
    """SAM2 image path: Hiera+FPN encoder, shared prompt encoder, SAM2
    decoder with high-res skips (reference modules/sam.py SAM2Model heads;
    the video path — memory attention, ring bank, object pointers — lives
    in sam2_video.py, see SAM2_VIDEO_NOTE)."""

    img_size: int = 1024
    encoder_embed_dim: int = 96
    encoder_stages: Tuple[int, ...] = (1, 2, 7, 2)
    encoder_num_heads: int = 1
    encoder_global_att_blocks: Tuple[int, ...] = (5, 7, 9)
    encoder_window_spec: Tuple[int, ...] = (8, 4, 14, 7)
    encoder_window_spatial_size: Tuple[int, int] = (7, 7)
    encoder_backbone_channel_list: Tuple[int, ...] = (768, 384, 192, 96)
    prompt_embed_dim: int = 256
    decoder_mlp_dim: int = 2048
    decoder_num_heads: int = 8
    iou_head_hidden_dim: int = 256
    dtype: Any = jnp.float32

    def setup(self):
        grid = self.img_size // 16
        self.trunk = Hiera(
            embed_dim=self.encoder_embed_dim,
            num_heads=self.encoder_num_heads,
            stages=self.encoder_stages,
            global_att_blocks=self.encoder_global_att_blocks,
            window_spec=self.encoder_window_spec,
            window_pos_embed_bkg_spatial_size=self.encoder_window_spatial_size,
            dtype=self.dtype,
        )
        self.neck = FpnNeck(
            d_model=self.prompt_embed_dim,
            backbone_channel_list=self.encoder_backbone_channel_list,
            fpn_top_down_levels=(2, 3),
            dtype=self.dtype,
        )
        self.sam_prompt_encoder = PromptEncoder(
            embed_dim=self.prompt_embed_dim,
            image_embedding_size=(grid, grid),
            input_image_size=(self.img_size, self.img_size),
            dtype=self.dtype,
        )
        self.sam_mask_decoder = SAM2MaskDecoder(
            transformer_dim=self.prompt_embed_dim,
            transformer_mlp_dim=self.decoder_mlp_dim,
            transformer_num_heads=self.decoder_num_heads,
            iou_head_hidden_dim=self.iou_head_hidden_dim,
            dtype=self.dtype,
        )

    def encode(self, x: Array):
        """Image -> (embed s16, high-res s0 C/8, s1 C/4) — the SAM2 feature
        cache (reference forward_image + _prepare_backbone_features)."""
        feats = self.trunk(x)
        outs, _pos = self.neck(feats)
        outs = outs[:-1]  # scalp=1: drop the stride-32 level (build.py:261)
        s0, s1 = self.sam_mask_decoder.high_res_convs(outs[0], outs[1])
        return outs[2], s0, s1

    def decode(self, emb, s0, s1, coords: Array, labels: Array,
               multimask_output: bool = True, masks: Optional[Array] = None):
        sparse, dense = self.sam_prompt_encoder(coords, labels, masks)
        pe = self.sam_prompt_encoder.dense_pe()
        B = coords.shape[0]
        if emb.shape[0] == 1 and B > 1:
            emb = jnp.broadcast_to(emb, (B,) + emb.shape[1:])
            s0 = jnp.broadcast_to(s0, (B,) + s0.shape[1:])
            s1 = jnp.broadcast_to(s1, (B,) + s1.shape[1:])
        return self.sam_mask_decoder(emb, pe, sparse, dense, multimask_output, (s0, s1))

    def __call__(self, x: Array, coords: Array, labels: Array,
                 multimask_output: bool = True, masks: Optional[Array] = None):
        emb, s0, s1 = self.encode(x)
        return self.decode(emb, s0, s1, coords, labels, multimask_output, masks)


class SAM2Predictor:
    """Encode-once/prompt-many predictor for SAM2 (mirrors SAMPredictor;
    reference predict.py SAM2Predictor)."""

    def __init__(self, model: SAM2Model, variables, img_size: int = 1024, max_points: int = 8):
        from bsyolo_tpu.models.sam.predict import SAMPredictor

        self._inner = SAMPredictor.__new__(SAMPredictor)
        p = self._inner
        p.model = model
        p.variables = variables
        p.img_size = img_size
        p.max_points = max_points
        p._encode = jax.jit(lambda v, x: model.apply(v, x, method=model.encode))
        # the SAMPredictor machinery expects (masks, iou); drop obj logits
        p._decode = jax.jit(
            lambda v, emb, c, l: model.apply(v, *emb, c, l, True, method=model.decode)[:2]
        )
        p._decode_single = jax.jit(
            lambda v, emb, c, l: model.apply(v, *emb, c, l, False, method=model.decode)[:2]
        )
        p._emb = None
        p._scale = 1.0
        p._orig_hw = (0, 0)
        p._in_hw = (0, 0)

    def set_image(self, img):
        self._inner.set_image(img)
        return self

    def __call__(self, **kw):
        out = self._inner(**kw)
        return out

    def generate(self, **kw):
        return self._inner.generate(**kw)
