"""TinyViT image encoder for MobileSAM, TPU-first flax
(reference models/sam/modules/tiny_encoder.py).

Hierarchical ViT: conv stem (/4), one MBConv stage, three windowed-attention
stages with LeViT-style learned attention-bias tables, patch-merging
downsamples, and the SAM 256-ch neck. All window partitions use static pads;
the attention-bias offset index table is precomputed in numpy at trace time
(the reference registers it as a non-persistent buffer, tiny_encoder.py:432).

Parameter names line up with the official mobile_sam.pt state_dict.
"""

from __future__ import annotations

import itertools
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bsyolo_tpu.models.sam.modules import LayerNorm2d, MaskDecoder, PromptEncoder

Array = jax.Array

_BN_EPS = 1e-5


class Conv2dBN(nn.Module):
    """Conv (no bias) + BN, inference-mode running stats
    (reference tiny_encoder.py:24)."""

    c2: int
    k: int = 1
    s: int = 1
    p: int = 0
    g: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(
            self.c2, (self.k, self.k), strides=(self.s, self.s), padding=self.p,
            feature_group_count=self.g, use_bias=False, dtype=self.dtype, name="c",
        )(x)
        return nn.BatchNorm(use_running_average=True, epsilon=_BN_EPS, dtype=self.dtype, name="bn")(x)


class TinyPatchEmbed(nn.Module):
    """Two stride-2 conv+BN+GELU stages: /4 resolution (tiny_encoder.py:62)."""

    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = Conv2dBN(self.embed_dim // 2, 3, 2, 1, dtype=self.dtype, name="seq_0")(x)
        x = nn.gelu(x, approximate=False)
        return Conv2dBN(self.embed_dim, 3, 2, 1, dtype=self.dtype, name="seq_2")(x)


class MBConv(nn.Module):
    """Mobile inverted bottleneck (tiny_encoder.py:104)."""

    c2: int
    expand_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c1 = x.shape[-1]
        hid = int(c1 * self.expand_ratio)
        y = nn.gelu(Conv2dBN(hid, 1, dtype=self.dtype, name="conv1")(x), approximate=False)
        y = nn.gelu(Conv2dBN(hid, 3, 1, 1, g=hid, dtype=self.dtype, name="conv2")(y), approximate=False)
        y = Conv2dBN(self.c2, 1, dtype=self.dtype, name="conv3")(y)
        return nn.gelu(x + y, approximate=False)


class PatchMerging(nn.Module):
    """1x1 expand + dw 3x3 (stride 2 unless out_dim in {320,448,576}) + 1x1
    (tiny_encoder.py:165)."""

    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s = 1 if self.out_dim in (320, 448, 576) else 2
        x = nn.gelu(Conv2dBN(self.out_dim, 1, dtype=self.dtype, name="conv1")(x), approximate=False)
        x = nn.gelu(
            Conv2dBN(self.out_dim, 3, s, 1, g=self.out_dim, dtype=self.dtype, name="conv2")(x),
            approximate=False,
        )
        return Conv2dBN(self.out_dim, 1, dtype=self.dtype, name="conv3")(x)


def _bias_idx_table(ws: int) -> np.ndarray:
    """LeViT offset-index table: (ws*ws, ws*ws) int of unique |dy|,|dx| ids
    (reference tiny_encoder.py:425-432)."""
    points = list(itertools.product(range(ws), range(ws)))
    offsets = {}
    idxs = []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    return np.asarray(idxs, np.int32).reshape(len(points), len(points))


class BiasAttention(nn.Module):
    """MHSA over window tokens with learned per-offset biases
    (reference tiny_encoder.py:363 Attention; attn_ratio=1 in TinyViT)."""

    dim: int
    key_dim: int
    num_heads: int
    window_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, N, _ = x.shape
        nh, kd = self.num_heads, self.key_dim
        d = kd  # attn_ratio = 1
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(nh * (2 * kd + d), dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, nh, 2 * kd + d)
        q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        idx = _bias_idx_table(self.window_size)
        biases = self.param("attention_biases", nn.initializers.zeros, (nh, int(idx.max()) + 1))
        attn = jnp.einsum("bnqc,bnkc->bnqk", q * (kd**-0.5), k, preferred_element_type=jnp.float32)
        attn = attn + biases.astype(jnp.float32)[:, jnp.asarray(idx)][None]
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bnqk,bnkc->bnqc", attn, v).transpose(0, 2, 1, 3).reshape(B, N, nh * d)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class TinyMlp(nn.Module):
    """LN + fc1 + GELU + fc2 (tiny_encoder.py:315)."""

    hidden: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class TinyViTBlock(nn.Module):
    """Windowed bias-attention + depthwise local conv + MLP
    (tiny_encoder.py:492)."""

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    local_conv_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h, w = self.input_resolution
        B, HW, C = x.shape
        ws = self.window_size
        res = x
        if h == ws and w == ws:
            x = BiasAttention(C, C // self.num_heads, self.num_heads, ws, dtype=self.dtype, name="attn")(x)
        else:
            xm = x.reshape(B, h, w, C)
            ph, pw = (-h) % ws, (-w) % ws
            xm = jnp.pad(xm, ((0, 0), (0, ph), (0, pw), (0, 0)))
            pH, pW = h + ph, w + pw
            nH, nW = pH // ws, pW // ws
            win = xm.reshape(B, nH, ws, nW, ws, C).transpose(0, 1, 3, 2, 4, 5).reshape(B * nH * nW, ws * ws, C)
            win = BiasAttention(C, C // self.num_heads, self.num_heads, ws, dtype=self.dtype, name="attn")(win)
            xm = win.reshape(B, nH, nW, ws, ws, C).transpose(0, 1, 3, 2, 4, 5).reshape(B, pH, pW, C)
            x = xm[:, :h, :w].reshape(B, HW, C)
        x = res + x
        xm = x.reshape(B, h, w, C)
        xm = Conv2dBN(C, self.local_conv_size, 1, self.local_conv_size // 2, g=C, dtype=self.dtype, name="local_conv")(xm)
        x = xm.reshape(B, HW, C)
        return x + TinyMlp(int(C * self.mlp_ratio), C, dtype=self.dtype, name="mlp")(x)


class TinyViT(nn.Module):
    """TinyViT-5M backbone + SAM neck -> (B, img/16, img/16, 256)
    (reference tiny_encoder.py:765; MobileSAM config build.py:56)."""

    img_size: int = 1024
    embed_dims: Tuple[int, ...] = (64, 128, 160, 320)
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (2, 4, 5, 10)
    window_sizes: Tuple[int, ...] = (7, 7, 14, 7)
    mlp_ratio: float = 4.0
    mbconv_expand_ratio: float = 4.0
    local_conv_size: int = 3
    out_chans: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pr = self.img_size // 4
        x = TinyPatchEmbed(self.embed_dims[0], dtype=self.dtype, name="patch_embed")(x)
        # stage 0: MBConv stack + merge (ConvLayer, tiny_encoder.py:222)
        for j in range(self.depths[0]):
            x = MBConv(self.embed_dims[0], self.mbconv_expand_ratio, dtype=self.dtype,
                       name=f"layers_0_blocks_{j}")(x)
        x = PatchMerging(self.embed_dims[1], dtype=self.dtype, name="layers_0_downsample")(x)
        B = x.shape[0]
        # stages 1..3: token-form windowed attention (BasicLayer)
        for i in range(1, len(self.depths)):
            ir = pr // (2 ** (i - 1 if i == 3 else i))
            C = self.embed_dims[i]
            x = x.reshape(B, ir * ir, C)
            for j in range(self.depths[i]):
                x = TinyViTBlock(
                    C, (ir, ir), self.num_heads[i], self.window_sizes[i],
                    self.mlp_ratio, self.local_conv_size, dtype=self.dtype,
                    name=f"layers_{i}_blocks_{j}",
                )(x)
            x = x.reshape(B, ir, ir, C)
            if i < len(self.depths) - 1:
                x = PatchMerging(self.embed_dims[i + 1], dtype=self.dtype, name=f"layers_{i}_downsample")(x)
        # neck (identical to the ViT encoder's)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype, name="neck_0")(x)
        x = LayerNorm2d(dtype=self.dtype, name="neck_1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="neck_2")(x)
        return LayerNorm2d(dtype=self.dtype, name="neck_3")(x)


class TinySAMModel(nn.Module):
    """MobileSAM: TinyViT encoder + standard SAM prompt/mask heads."""

    img_size: int = 1024
    prompt_embed_dim: int = 256
    dtype: Any = jnp.float32

    def setup(self):
        grid = self.img_size // 16
        self.image_encoder = TinyViT(img_size=self.img_size, dtype=self.dtype)
        self.prompt_encoder = PromptEncoder(
            embed_dim=self.prompt_embed_dim,
            image_embedding_size=(grid, grid),
            input_image_size=(self.img_size, self.img_size),
            dtype=self.dtype,
        )
        self.mask_decoder = MaskDecoder(transformer_dim=self.prompt_embed_dim, dtype=self.dtype)

    def __call__(self, x: Array, coords: Array, labels: Array, multimask_output: bool = True,
                 masks: Optional[Array] = None):
        emb = self.image_encoder(x)
        return self.decode(emb, coords, labels, multimask_output, masks)

    def encode(self, x: Array) -> Array:
        return self.image_encoder(x)

    def decode(self, emb: Array, coords: Array, labels: Array, multimask_output: bool = True,
               masks: Optional[Array] = None):
        sparse, dense = self.prompt_encoder(coords, labels, masks)
        pe = self.prompt_encoder.dense_pe()
        if emb.shape[0] == 1 and coords.shape[0] > 1:
            emb = jnp.broadcast_to(emb, (coords.shape[0],) + emb.shape[1:])
        return self.mask_decoder(emb, pe, sparse, dense, multimask_output)
