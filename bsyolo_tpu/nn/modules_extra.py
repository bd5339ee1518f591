"""Experimental / Addmodules block zoo (flax.linen, NHWC).

The reference keeps a large set of experimental attention blocks in-tree and
selectable from model YAMLs (reference nn/tasks.py:940 parse_model registers
them; nn/Addmodules/__init__.py exports them).  This module rebuilds every
such block that the reference parser (or the ``sys/`` vendored copy's parser)
actually accepts, so any reference YAML using them loads here too:

main tree (reference ultralytics/nn/):
- SimConvBN / SimSPPF           block.py:340/366 (ReLU SPPF)
- SPPFCSPC                      block.py:3240
- BottleneckCSP                 block.py:3422
- TransformerLayer/Block, C3TR  modules/transformer.py:118/137, block.py:3364
- GSConv                        modules/conv.py:37 (slim-neck, deinterleave shuffle)
- DWConvTranspose2dLayer        modules/conv.py:232
- FocalModulation               Addmodules/FocalModulation.py:3
- LRSA family (C3k2_LRSA)       block.py:3935-4180 (patched local self-attention)
- OutlookAttention family       Addmodules/OutlookAttention.py (VOLO outlooker)
- MogaNet family (C3K2_MultiOGA) Addmodules/Moganet.py (multi-order gated aggregation)

sys/ vendored copy extras (reference sys/ultralytics/nn/):
- CoordAtt                      Addmodules/CoordAtt.py:24
- SCConv family                 Addmodules/SCConv.py (SRU+CRU)
- IEL family (C3k2_IEL)         modules/block.py:1672
- RetBlock family (C3k2_RetBlock) modules/block.py:1464 (RMT decayed retention)

Addmodules exports without a parser entry (importable building blocks):
- WTConv2d                      Addmodules/WTConv.py (wavelet conv, db1/Haar)
- CondConv2D                    Addmodules/condconv.py (per-sample expert kernels)

All modules mirror the torch parameter naming so utils/torch_weights.py
converts reference checkpoints without special cases.  Dropout layers carry
p=0 in every graph the reference ships, so they are omitted (inference parity
is exact; training matches the reference's effective behavior).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bsyolo_tpu.nn.modules import (
    BN_EPS,
    BN_MOMENTUM,
    Bottleneck,
    C2f,
    C3,
    C3k,
    ConvBN,
    TConv,
    TDense,
    autopad,
    max_pool2d,
)

Array = jax.Array


# ---------------------------------------------------------------------------
# SimSPPF (ReLU SPPF) — reference block.py:340 SimConv / :366 SimSPPF
# ---------------------------------------------------------------------------


class SimConvBN(nn.Module):
    """Conv + BN + fixed ReLU (reference SimConv, block.py:340)."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        pad = self.k // 2
        x = TConv(self.c2, (self.k, self.k), (self.s, self.s),
                    padding=[(pad, pad), (pad, pad)], feature_group_count=self.g,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class SimSPPF(nn.Module):
    """Simplified SPPF with ReLU (reference block.py:366)."""

    c2: int
    k: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c_ = x.shape[-1] // 2
        x = SimConvBN(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y1 = max_pool2d(x, self.k, 1, self.k // 2)
        y2 = max_pool2d(y1, self.k, 1, self.k // 2)
        y3 = max_pool2d(y2, self.k, 1, self.k // 2)
        return SimConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([x, y1, y2, y3], axis=-1), train
        )


class SPPFCSPC(nn.Module):
    """CSP-wrapped SPPF (reference block.py:3240). ``n`` is accepted but
    unused, exactly like the reference signature."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    k: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c_ = int(2 * self.c2 * self.e)
        x1 = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        x1 = ConvBN(c_, 3, 1, dtype=self.dtype, name="cv3")(x1, train)
        x1 = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv4")(x1, train)
        x2 = max_pool2d(x1, self.k, 1, self.k // 2)
        x3 = max_pool2d(x2, self.k, 1, self.k // 2)
        x4 = max_pool2d(x3, self.k, 1, self.k // 2)
        y1 = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv5")(
            jnp.concatenate([x1, x2, x3, x4], axis=-1), train
        )
        y1 = ConvBN(c_, 3, 1, dtype=self.dtype, name="cv6")(y1, train)
        y2 = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv7")(
            jnp.concatenate([y1, y2], axis=-1), train
        )


class BottleneckCSP(nn.Module):
    """Original CSP bottleneck (reference block.py:3422): raw 1x1 convs on the
    two branches, shared BN over the concat, fixed SiLU."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c_ = int(self.c2 * self.e)
        a = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, self.g, k=(3, 3), e=1.0,
                           dtype=self.dtype, name=f"m_{i}")(a, train)
        y1 = TConv(c_, (1, 1), use_bias=False, dtype=self.dtype, name="cv3")(a)
        y2 = TConv(c_, (1, 1), use_bias=False, dtype=self.dtype, name="cv2")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn")(
            jnp.concatenate([y1, y2], axis=-1)
        )
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv4")(nn.silu(y), train)


# ---------------------------------------------------------------------------
# C3TR — ViT block inside C3 (reference transformer.py:118/137, block.py:3364)
# ---------------------------------------------------------------------------


class TransformerLayer(nn.Module):
    """Pre-projection + torch nn.MultiheadAttention + 2-layer MLP, no norms
    (reference transformer.py:118)."""

    c: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # x: (B, L, C). q/k/v pre-projections are bias-free.
        q = TDense(self.c, use_bias=False, dtype=self.dtype, name="q")(x)
        k = TDense(self.c, use_bias=False, dtype=self.dtype, name="k")(x)
        v = TDense(self.c, use_bias=False, dtype=self.dtype, name="v")(x)
        # torch MHA packs its own qkv projection as in_proj_weight (3C, C)
        # + in_proj_bias (3C,); keep the torch layout so the converter's
        # leaf passthrough maps ma.in_proj_weight / ma.out_proj.* directly.
        ma = _MultiheadAttention(self.c, self.num_heads, dtype=self.dtype, name="ma")
        x = ma(q, k, v) + x
        y = TDense(self.c, use_bias=False, dtype=self.dtype, name="fc1")(x)
        return TDense(self.c, use_bias=False, dtype=self.dtype, name="fc2")(y) + x


class _MultiheadAttention(nn.Module):
    """torch nn.MultiheadAttention (batch_first semantics handled by caller:
    inputs here are (B, L, C))."""

    c: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array) -> Array:
        w = self.param("in_proj_weight", nn.initializers.xavier_uniform(),
                       (3 * self.c, self.c), jnp.float32)
        b = self.param("in_proj_bias", nn.initializers.zeros, (3 * self.c,), jnp.float32)
        w = w.astype(self.dtype)
        b = b.astype(self.dtype)
        wq, wk, wv = jnp.split(w, 3, axis=0)
        bq, bk, bv = jnp.split(b, 3, axis=0)
        q = q @ wq.T + bq
        k = k @ wk.T + bk
        v = v @ wv.T + bv
        B, L, C = q.shape
        h, d = self.num_heads, C // self.num_heads
        q = q.reshape(B, L, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, h, d).transpose(0, 2, 1, 3)
        attn = nn.softmax(q @ k.transpose(0, 1, 3, 2) / math.sqrt(d), axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, L, C)
        return TDense(self.c, dtype=self.dtype, name="out_proj")(out)


class TransformerBlock(nn.Module):
    """ViT block stack with learned positional embedding (transformer.py:137)."""

    c2: int
    num_heads: int
    num_layers: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if x.shape[-1] != self.c2:
            x = ConvBN(self.c2, 1, 1, dtype=self.dtype, name="conv")(x, train)
        B, H, W, C = x.shape
        p = x.reshape(B, H * W, C)
        p = p + TDense(self.c2, dtype=self.dtype, name="linear")(p)
        for i in range(self.num_layers):
            p = TransformerLayer(self.c2, self.num_heads, dtype=self.dtype, name=f"tr_{i}")(p)
        return p.reshape(B, H, W, self.c2)


class C3TR(C3):
    """C3 whose inner stack is a TransformerBlock (reference block.py:3364).
    The torch module names it ``m`` (not a Sequential), hence name="m"."""

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c_ = int(self.c2 * self.e)
        a = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        b = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        a = TransformerBlock(c_, 4, self.n, dtype=self.dtype, name="m")(a, train)
        return ConvBN(self.c2, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], axis=-1), train
        )


# ---------------------------------------------------------------------------
# GSConv (slim-neck) — reference conv.py:37
# ---------------------------------------------------------------------------


class GSConv(nn.Module):
    """Half dense conv + half 5x5 depthwise, then channel deinterleave
    (reference conv.py:37; the reshape dance there is exactly an
    even/odd-channel deinterleave)."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c_ = self.c2 // 2
        x1 = ConvBN(c_, self.k, self.s, g=self.g, dtype=self.dtype, name="cv1")(x, train)
        x2 = ConvBN(c_, 5, 1, g=c_, dtype=self.dtype, name="cv2")(x1, train)
        y = jnp.concatenate([x1, x2], axis=-1)
        return jnp.concatenate([y[..., 0::2], y[..., 1::2]], axis=-1)


class DWConvTranspose2dLayer(nn.Module):
    """torch DWConvTranspose2d (conv.py:232): grouped ConvTranspose2d with
    groups=gcd(c1, c2), bias=True, used directly as a graph layer."""

    c2: int
    k: int = 1
    s: int = 1
    p1: int = 0
    p2: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c1 = x.shape[-1]
        g = math.gcd(c1, self.c2)
        c1pg, c2pg = c1 // g, self.c2 // g
        # param kept in the torch ConvTranspose2d layout (c1, c2/g, kH, kW)
        # so checkpoint conversion is a pass-through; rearranged at trace time
        # into the HWIO kernel of the equivalent lhs-dilated grouped conv.
        w = self.param(
            "weight", nn.initializers.lecun_normal(),
            (c1, c2pg, self.k, self.k), jnp.float32
        ).astype(self.dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.c2,), jnp.float32).astype(self.dtype)
        kernel = w.reshape(g, c1pg, c2pg, self.k, self.k).transpose(3, 4, 1, 0, 2)
        kernel = jnp.flip(kernel.reshape(self.k, self.k, c1pg, self.c2), (0, 1))
        lo = self.k - 1 - self.p1
        hi = self.k - 1 - self.p1 + self.p2
        y = jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(1, 1),
            padding=[(lo, hi), (lo, hi)],
            lhs_dilation=(self.s, self.s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=g,
        )
        return y + bias


# ---------------------------------------------------------------------------
# FocalModulation — reference Addmodules/FocalModulation.py
# ---------------------------------------------------------------------------


class FocalModulation(nn.Module):
    """Focal modulation attention (NCHW reference operating on 1x1 convs —
    identical math on NHWC)."""

    dim: int
    focal_window: int = 3
    focal_level: int = 2
    focal_factor: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        C = self.dim
        y = TConv(2 * C + self.focal_level + 1, (1, 1), use_bias=True,
                    dtype=self.dtype, name="f_linear")(x)
        q, ctx, gates = jnp.split(y, [C, 2 * C], axis=-1)
        ctx_all = 0.0
        for l in range(self.focal_level):
            ks = self.focal_factor * l + self.focal_window
            ctx = TConv(C, (ks, ks), padding=[(ks // 2, ks // 2)] * 2,
                          feature_group_count=C, use_bias=False,
                          dtype=self.dtype, name=f"focal_layers_{l}_0")(ctx)
            ctx = nn.gelu(ctx, approximate=False)
            ctx_all = ctx_all + ctx * gates[..., l:l + 1]
        ctx_global = nn.gelu(jnp.mean(ctx, axis=(1, 2), keepdims=True), approximate=False)
        ctx_all = ctx_all + ctx_global * gates[..., self.focal_level:]
        out = q * TConv(C, (1, 1), use_bias=True, dtype=self.dtype, name="h")(ctx_all)
        return TConv(C, (1, 1), use_bias=True, dtype=self.dtype, name="proj")(out)


# ---------------------------------------------------------------------------
# LRSA — patched local self-attention (reference block.py:3935-4180)
# ---------------------------------------------------------------------------


def _patch_starts(size: int, step: int, ps: int) -> list:
    """Static top-left offsets of reference patch_divide (block.py:3935)."""
    starts = []
    for i in range(0, size + step - ps, step):
        starts.append(min(i, size - ps))
    return starts


def patch_divide(x: Array, step: int, ps: int) -> Tuple[Array, list, list]:
    """Crop (B,H,W,C) into overlapping (B,N,ps,ps,C) patches (static)."""
    B, H, W, C = x.shape
    if H == ps and W == ps:
        step = ps
    hs = _patch_starts(H, step, ps)
    ws = _patch_starts(W, step, ps)
    crops = [x[:, i:i + ps, j:j + ps, :] for i in hs for j in ws]
    return jnp.stack(crops, axis=1), hs, ws


def patch_reverse(crop_x: Array, shape: Tuple[int, int], step: int, ps: int) -> Array:
    """Overlap-add inverse of patch_divide with the reference's /2 overlap
    normalization (block.py:3971)."""
    H, W = shape
    B, N, _, _, C = crop_x.shape
    if H == ps and W == ps:
        step = ps
    hs = _patch_starts(H, step, ps)
    ws = _patch_starts(W, step, ps)
    out = jnp.zeros((B, H, W, C), crop_x.dtype)
    idx = 0
    for i in hs:
        for j in ws:
            out = out.at[:, i:i + ps, j:j + ps, :].add(crop_x[:, idx])
            idx += 1
    # halve the doubly-written overlap strips (reference loops at :1002-1014)
    for i in range(step, H + step - ps, step):
        top = min(i, H - ps)
        down = i + ps - step
        out = out.at[:, top:down, :, :].multiply(0.5)
    for j in range(step, W + step - ps, step):
        left = min(j, W - ps)
        right = j + ps - step
        out = out.at[:, :, left:right, :].multiply(0.5)
    return out


class AttentionLRSA(nn.Module):
    """SDPA with a reduced qk dim (reference Attention_LRSA, block.py:4063)."""

    dim: int
    heads: int = 1
    qk_dim: int = 36
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # x: (B*, L, C)
        q = TDense(self.qk_dim, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = TDense(self.qk_dim, use_bias=False, dtype=self.dtype, name="to_k")(x)
        v = TDense(self.dim, use_bias=False, dtype=self.dtype, name="to_v")(x)
        Bn, L, _ = q.shape
        h = self.heads
        q = q.reshape(Bn, L, h, -1).transpose(0, 2, 1, 3)
        k = k.reshape(Bn, L, h, -1).transpose(0, 2, 1, 3)
        v = v.reshape(Bn, L, h, -1).transpose(0, 2, 1, 3)
        # F.scaled_dot_product_attention scales by 1/sqrt(head qk dim)
        attn = nn.softmax(q @ k.transpose(0, 1, 3, 2) / math.sqrt(q.shape[-1]), axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(Bn, L, self.dim)
        return TDense(self.dim, use_bias=False, dtype=self.dtype, name="proj")(out)


class _DWConvGELU(nn.Module):
    """Reference block.py:4030 ``dwconv``: depthwise conv + GELU over the
    (H, W) layout; named so params land at dwconv.depthwise_conv.0.*"""

    hidden: int
    kernel_size: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, x_size: Tuple[int, int]) -> Array:
        B, L, C = x.shape
        hh = x.reshape(B, x_size[0], x_size[1], C)
        dw = TConv(self.hidden, (self.kernel_size, self.kernel_size),
                     padding=[((self.kernel_size - 1) // 2,) * 2] * 2,
                     feature_group_count=self.hidden, use_bias=True,
                     dtype=self.dtype, name="depthwise_conv_0")(hh)
        return nn.gelu(dw, approximate=False).reshape(B, L, C)


class ConvFFN(nn.Module):
    """Linear -> GELU -> (+depthwise conv residual) -> Linear (block.py:4045)."""

    dim: int
    hidden: int
    kernel_size: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, x_size: Tuple[int, int]) -> Array:
        h = TDense(self.hidden, dtype=self.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = h + _DWConvGELU(self.hidden, self.kernel_size, dtype=self.dtype,
                            name="dwconv")(h, x_size)
        return TDense(self.dim, dtype=self.dtype, name="fc2")(h)


class _PreNormAttn(nn.Module):
    """PreNorm(Attention_LRSA) — children named norm/fn like the torch
    ModuleList entry ``layer.0`` (block.py:4013)."""

    dim: int
    heads: int
    qk_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        normed = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return AttentionLRSA(self.dim, self.heads, self.qk_dim,
                             dtype=self.dtype, name="fn")(normed)


class _PreNormFFN(nn.Module):
    """PreNorm(ConvFFN) — the torch ModuleList entry ``layer.1``."""

    dim: int
    mlp_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, x_size: Tuple[int, int]) -> Array:
        normed = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return ConvFFN(self.dim, self.mlp_dim, dtype=self.dtype, name="fn")(normed, x_size)


class LRSA(nn.Module):
    """Patched local self-attention + global ConvFFN (reference block.py:4096).

    Fixed patch size 16, step 14 (the reference hardcodes ps=16 in forward).
    """

    dim: int
    qk_dim: int = 36
    mlp_dim: int = 96
    heads: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        ps, step = 16, 14
        B, H, W, C = x.shape
        crop, hs, ws = patch_divide(x, step, ps)  # (B, N, ps, ps, C)
        N = crop.shape[1]
        seq = crop.reshape(B * N, ps * ps, C)
        seq = _PreNormAttn(self.dim, self.heads, self.qk_dim,
                           dtype=self.dtype, name="layer_0")(seq) + seq
        crop = seq.reshape(B, N, ps, ps, C)
        x = patch_reverse(crop, (H, W), step, ps)
        flat = x.reshape(B, H * W, C)
        flat = _PreNormFFN(self.dim, self.mlp_dim, dtype=self.dtype,
                           name="layer_1")(flat, (H, W)) + flat
        return flat.reshape(B, H, W, C)


class BottleneckLRSA(nn.Module):
    """Bottleneck whose output runs through LRSA (reference block.py:4133)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: Tuple[int, int] = (3, 3)
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = ConvBN(c_, self.k[0], 1, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBN(self.c2, self.k[1], 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        y = LRSA(self.c2, dtype=self.dtype, name="lrsa")(y, train)
        return x + y if self.shortcut and c1 == self.c2 else y


class C3kLRSA(C3):
    """C3 over LRSA bottlenecks (reference C3k_LRSA, block.py:4155)."""

    kk: int = 3

    def inner_block(self, c: int, i: int):
        return BottleneckLRSA(c, self.shortcut, self.g, k=(self.kk, self.kk),
                              e=1.0, dtype=self.dtype, name=f"m_{i}")


class C3k2_LRSA(C2f):
    """C2f over LRSA bottlenecks / C3k_LRSA (reference block.py:4167)."""

    c3k: bool = False

    def inner_block(self, c: int, i: int):
        if self.c3k:
            return C3kLRSA(c, 2, self.shortcut, self.g, dtype=self.dtype, name=f"m_{i}")
        return BottleneckLRSA(c, self.shortcut, self.g, dtype=self.dtype, name=f"m_{i}")


# ---------------------------------------------------------------------------
# OutlookAttention (VOLO) — reference Addmodules/OutlookAttention.py
# ---------------------------------------------------------------------------


class OutlookAttention(nn.Module):
    """Outlook attention, stride-1 configuration (the only one the reference
    graph wrappers use). unfold/fold are written as 9 static shifted slices /
    an overlap-add — the TPU-friendly formulation of im2col on a 3x3 window."""

    dim: int
    num_heads: int = 1
    kernel_size: int = 3
    padding: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        B, H, W, C = x.shape
        k, p, heads = self.kernel_size, self.padding, self.num_heads
        ch = C // heads
        scale = (ch) ** -0.5
        v = TDense(C, use_bias=False, dtype=self.dtype, name="v")(x)
        # unfold: (B, H, W, kk, C) patches, kernel offsets row-major like torch
        vp = jnp.pad(v, ((0, 0), (p, p), (p, p), (0, 0)))
        patches = jnp.stack(
            [vp[:, i:i + H, j:j + W, :] for i in range(k) for j in range(k)], axis=3
        )  # (B, H, W, kk, C)
        # (B, heads, N, kk, ch)
        vv = patches.reshape(B, H * W, k * k, heads, ch).transpose(0, 3, 1, 2, 4)
        attn = TDense(k ** 4 * heads, use_bias=True, dtype=self.dtype, name="attn")(x)
        attn = attn.reshape(B, H * W, heads, k * k, k * k).transpose(0, 2, 1, 3, 4)
        attn = nn.softmax(attn * scale, axis=-1)
        out = attn @ vv  # (B, heads, N, kk, ch)
        out = out.transpose(0, 2, 3, 1, 4).reshape(B, H, W, k * k, C)
        # fold: overlap-add the shifted windows back
        buf = jnp.zeros((B, H + 2 * p, W + 2 * p, C), out.dtype)
        idx = 0
        for i in range(k):
            for j in range(k):
                buf = buf.at[:, i:i + H, j:j + W, :].add(out[:, :, :, idx, :])
                idx += 1
        y = buf[:, p:p + H, p:p + W, :]
        return TDense(C, use_bias=True, dtype=self.dtype, name="proj")(y)


class BottleneckOAtention(nn.Module):
    """Bottleneck + OutlookAttention tail (reference OutlookAttention.py
    Bottleneck_OAtention; the wrapper always passes num_heads=4)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: Tuple[Any, Any] = (3, 3)
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        k0 = self.k[0] if isinstance(self.k[0], int) else self.k[0][0]
        k1 = self.k[1] if isinstance(self.k[1], int) else self.k[1][0]
        y = ConvBN(c_, k0, 1, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBN(self.c2, k1, 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        y = OutlookAttention(self.c2, 4, dtype=self.dtype, name="cv3")(y, train)
        return x + y if self.shortcut and c1 == self.c2 else y


class C3kOAtention(C3):
    """C3k over outlook bottlenecks (OutlookAttention.py local C3k)."""

    kk: int = 3

    def inner_block(self, c: int, i: int):
        return BottleneckOAtention(c, self.shortcut, self.g, k=(self.kk, self.kk),
                                   e=1.0, dtype=self.dtype, name=f"m_{i}")


class C3K2_OAtention(C2f):
    """C3k2 over outlook bottlenecks (reference OutlookAttention.py:173)."""

    c3k: bool = False

    def inner_block(self, c: int, i: int):
        if self.c3k:
            return C3kOAtention(c, 2, self.shortcut, self.g, dtype=self.dtype, name=f"m_{i}")
        return BottleneckOAtention(c, self.shortcut, self.g, k=(3, 3), e=1.0,
                                   dtype=self.dtype, name=f"m_{i}")


# ---------------------------------------------------------------------------
# MogaNet multi-order gated aggregation — reference Addmodules/Moganet.py
# ---------------------------------------------------------------------------


class MultiOrderDWConv(nn.Module):
    """Three dilated depthwise convs over channel splits 1:3:4 (Moganet.py:60)."""

    embed_dims: int
    dw_dilation: Tuple[int, int, int] = (1, 2, 3)
    channel_split: Tuple[int, int, int] = (1, 3, 4)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        C = self.embed_dims
        total = sum(self.channel_split)
        d1 = int(self.channel_split[1] / total * C)
        d2 = int(self.channel_split[2] / total * C)
        d0 = C - d1 - d2
        dil = self.dw_dilation

        def dw(name, feats, k, dilation, src):
            pad = (1 + (k - 1) * dilation) // 2
            return TConv(feats, (k, k), padding=[(pad, pad)] * 2,
                           feature_group_count=feats, kernel_dilation=(dilation, dilation),
                           use_bias=True, dtype=self.dtype, name=name)(src)

        x0 = dw("DW_conv0", C, 5, dil[0], x)
        x1 = dw("DW_conv1", d1, 5, dil[1], x0[..., d0:d0 + d1])
        x2 = dw("DW_conv2", d2, 7, dil[2], x0[..., C - d2:])
        y = jnp.concatenate([x0[..., :d0], x1, x2], axis=-1)
        return TConv(C, (1, 1), use_bias=True, dtype=self.dtype, name="PW_conv")(y)


class MultiOrderGatedAggregation(nn.Module):
    """Moganet spatial block (Moganet.py:107): decomposed value branch gated
    by a SiLU gate, with a learnable global-context subtraction (sigma)."""

    embed_dims: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        C = self.embed_dims
        sigma = self.param("sigma", nn.initializers.constant(1e-5), (1, 1, 1, C), jnp.float32)
        shortcut = x
        y = TConv(C, (1, 1), use_bias=True, dtype=self.dtype, name="proj_1")(x)
        y_d = jnp.mean(y, axis=(1, 2), keepdims=True)
        y = y + sigma.astype(y.dtype) * (y - y_d)
        y = nn.silu(y)
        g = TConv(C, (1, 1), use_bias=True, dtype=self.dtype, name="gate")(y)
        v = MultiOrderDWConv(C, dtype=self.dtype, name="value")(y)
        y = TConv(C, (1, 1), use_bias=True, dtype=self.dtype, name="proj_2")(
            nn.silu(g) * nn.silu(v)
        )
        return y + shortcut


class BottleneckMultiOGA(nn.Module):
    """MOGA + conv bottleneck (Moganet.py Bottleneck_MultiOGA)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: Tuple[Any, Any] = (3, 3)
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        k1 = self.k[1] if isinstance(self.k[1], int) else self.k[1][0]
        y = MultiOrderGatedAggregation(c1, dtype=self.dtype, name="cv1")(x, train)
        # reference: cv2 = Conv(c_, c2) — requires e=1.0 (the wrappers pass it)
        y = ConvBN(self.c2, k1, 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and c1 == self.c2 else y


class C3K2_MultiOGA(C2f):
    """C3k2 over MOGA bottlenecks (Moganet.py C3K2_MultiOGA). The reference
    parser registers this name but only in its repeats set (tasks.py:1041) —
    a fork bug that makes it unusable from YAML there; this parser applies
    the full conv-like rule so the block actually loads."""

    c3k: bool = False

    def inner_block(self, c: int, i: int):
        if self.c3k:
            return C3k(c, 2, self.shortcut, self.g, dtype=self.dtype, name=f"m_{i}")
        return BottleneckMultiOGA(c, self.shortcut, self.g, k=(3, 3), e=1.0,
                                  dtype=self.dtype, name=f"m_{i}")


# ---------------------------------------------------------------------------
# CoordAtt — reference sys/ultralytics/nn/Addmodules/CoordAtt.py:24
# ---------------------------------------------------------------------------


def _h_swish(x: Array) -> Array:
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


class CoordAtt(nn.Module):
    """Coordinate attention: axial pooled descriptors -> shared 1x1 conv ->
    per-axis sigmoid gates multiplied into the identity."""

    oup: int
    reduction: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        B, H, W, C = x.shape
        mip = max(8, C // self.reduction)
        x_h = jnp.mean(x, axis=2, keepdims=True)                  # (B, H, 1, C)
        x_w = jnp.mean(x, axis=1, keepdims=True).transpose(0, 2, 1, 3)  # (B, W, 1, C)
        y = jnp.concatenate([x_h, x_w], axis=1)                   # (B, H+W, 1, C)
        y = TConv(mip, (1, 1), use_bias=True, dtype=self.dtype, name="conv1")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn1")(y)
        y = _h_swish(y)
        y_h, y_w = y[:, :H], y[:, H:]
        y_w = y_w.transpose(0, 2, 1, 3)                           # (B, 1, W, mip)
        a_h = nn.sigmoid(TConv(self.oup, (1, 1), use_bias=True, dtype=self.dtype,
                                 name="conv_h")(y_h))
        a_w = nn.sigmoid(TConv(self.oup, (1, 1), use_bias=True, dtype=self.dtype,
                                 name="conv_w")(y_w))
        return x * a_w * a_h


# ---------------------------------------------------------------------------
# SCConv (SRU + CRU) — reference sys/ultralytics/nn/Addmodules/SCConv.py
# ---------------------------------------------------------------------------


class GroupBatchnorm2d(nn.Module):
    """Group-statistics normalization with per-channel affine (SCConv.py:60;
    the reference's debug print()s are dropped). std uses Bessel correction
    like torch Tensor.std."""

    group_num: int = 16
    eps: float = 1e-10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array]:
        B, H, W, C = x.shape
        g = self.group_num
        gamma = self.param("gamma", nn.initializers.normal(1.0), (C,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (C,), jnp.float32)
        # torch view(N, g, -1) groups CONTIGUOUS channel blocks with their
        # spatial extent: transpose to channel-major, then group.
        xt = x.transpose(0, 3, 1, 2).reshape(B, g, -1)
        mean = xt.mean(axis=2, keepdims=True)
        n = xt.shape[2]
        var = jnp.sum((xt - mean) ** 2, axis=2, keepdims=True) / (n - 1)
        xt = (xt - mean) / (jnp.sqrt(var) + self.eps)
        xt = xt.reshape(B, C, H, W).transpose(0, 2, 3, 1)
        return xt * gamma.astype(xt.dtype) + beta.astype(xt.dtype), gamma


class SRU(nn.Module):
    """Spatial reconstruct unit (SCConv.py:82)."""

    group_num: int = 16
    gate_threshold: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        gn_x, gamma = GroupBatchnorm2d(self.group_num, dtype=self.dtype, name="gn")(x)
        w_gamma = (gamma / jnp.sum(gamma)).astype(gn_x.dtype)
        reweights = nn.sigmoid(gn_x * w_gamma)
        info = reweights >= self.gate_threshold
        x1 = jnp.where(info, x, 0.0)
        x2 = jnp.where(info, 0.0, x)
        c = x.shape[-1] // 2
        x11, x12 = x1[..., :c], x1[..., c:]
        x21, x22 = x2[..., :c], x2[..., c:]
        return jnp.concatenate([x11 + x22, x12 + x21], axis=-1)


class CRU(nn.Module):
    """Channel reconstruct unit (SCConv.py:109)."""

    alpha: float = 0.5
    squeeze_ratio: int = 2
    group_size: int = 2
    group_kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        C = x.shape[-1]
        up_c = int(self.alpha * C)
        low_c = C - up_c
        sq = self.squeeze_ratio
        up, low = x[..., :up_c], x[..., up_c:]
        up = TConv(up_c // sq, (1, 1), use_bias=False, dtype=self.dtype, name="squeeze1")(up)
        low = TConv(low_c // sq, (1, 1), use_bias=False, dtype=self.dtype, name="squeeze2")(low)
        k = self.group_kernel_size
        y1 = TConv(C, (k, k), padding=[(k // 2, k // 2)] * 2, use_bias=True,
                     feature_group_count=self.group_size, dtype=self.dtype, name="GWC")(up) \
            + TConv(C, (1, 1), use_bias=False, dtype=self.dtype, name="PWC1")(up)
        y2 = jnp.concatenate(
            [TConv(C - low_c // sq, (1, 1), use_bias=False, dtype=self.dtype,
                     name="PWC2")(low), low], axis=-1)
        out = jnp.concatenate([y1, y2], axis=-1)
        att = nn.softmax(jnp.mean(out, axis=(1, 2), keepdims=True), axis=-1)
        out = att * out
        half = out.shape[-1] // 2
        return out[..., :half] + out[..., half:]


class SCConv(nn.Module):
    """SRU + CRU (SCConv.py:148). Channel count derives from the input, so
    every wrapper configuration runs (the reference crashes when its wrapper
    passes a mismatched op_channel — verified against sys/ C3k2_SCConv's
    default e=0.5 path)."""

    group_num: int = 16
    gate_threshold: float = 0.5
    alpha: float = 0.5
    squeeze_ratio: int = 2
    group_size: int = 2
    group_kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = SRU(self.group_num, self.gate_threshold, dtype=self.dtype, name="SRU")(x)
        return CRU(self.alpha, self.squeeze_ratio, self.group_size,
                   self.group_kernel_size, dtype=self.dtype, name="CRU")(x)


class BottleneckSCConv(nn.Module):
    """Conv + SCConv bottleneck (SCConv.py:175 Bottleneck_SCConv)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: Tuple[int, int] = (3, 3)
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = ConvBN(c_, self.k[0], 1, dtype=self.dtype, name="cv1")(x, train)
        y = SCConv(dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and c1 == self.c2 and y.shape[-1] == c1 else y


class C2f_SCConv(C2f):
    """C2f over SCConv bottlenecks (SCConv.py:180)."""

    def inner_block(self, c: int, i: int):
        return BottleneckSCConv(c, self.shortcut, self.g, k=(3, 3), e=1.0,
                                dtype=self.dtype, name=f"m_{i}")


class C3k2_SCConv(C2f):
    """C3k2 over SCConv bottlenecks (SCConv.py:185). The reference's non-c3k
    default (inner e=0.5) produces mismatched channel counts and cannot
    execute; here the inner bottleneck uses e=1.0 so the block runs (the
    c3k=True path matches the reference exactly: plain C3k)."""

    c3k: bool = False

    def inner_block(self, c: int, i: int):
        if self.c3k:
            return C3k(c, 2, self.shortcut, self.g, dtype=self.dtype, name=f"m_{i}")
        return BottleneckSCConv(c, self.shortcut, self.g, e=1.0, dtype=self.dtype, name=f"m_{i}")


# ---------------------------------------------------------------------------
# IEL — reference sys/ultralytics/nn/modules/block.py:1672 + Addmodules/IEL.py
# ---------------------------------------------------------------------------


class IEL(nn.Module):
    """Dual-gated depthwise FFN (sys Addmodules/IEL.py:3)."""

    dim: int
    ffn_expansion_factor: float = 2.66
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        hidden = int(self.dim * self.ffn_expansion_factor)
        x = TConv(hidden * 2, (1, 1), use_bias=False, dtype=self.dtype, name="project_in")(x)
        x = TConv(hidden * 2, (3, 3), padding=[(1, 1)] * 2, feature_group_count=hidden * 2,
                    use_bias=False, dtype=self.dtype, name="dwconv")(x)
        x1, x2 = jnp.split(x, 2, axis=-1)
        x1 = jnp.tanh(TConv(hidden, (3, 3), padding=[(1, 1)] * 2, feature_group_count=hidden,
                              use_bias=False, dtype=self.dtype, name="dwconv1")(x1)) + x1
        x2 = jnp.tanh(TConv(hidden, (3, 3), padding=[(1, 1)] * 2, feature_group_count=hidden,
                              use_bias=False, dtype=self.dtype, name="dwconv2")(x2)) + x2
        return TConv(self.dim, (1, 1), use_bias=False, dtype=self.dtype, name="project_out")(x1 * x2)


def _plain_bn(x, train, dtype, name):
    """BatchNorm2d as it behaves inside a built reference graph: the model
    constructor's initialize_weights (reference torch_utils.py:417-427)
    rewrites every BN to eps 1e-3 / momentum 0.03."""
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                        epsilon=BN_EPS, dtype=dtype, name=name)(x)


class BottleneckIEL(nn.Module):
    """Bottleneck + inner IEL enhancement (sys block.py:1672 Bottleneck_IEL)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: Tuple[int, int] = (3, 3)
    e: float = 0.5
    ffn_ratio: float = 1.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        k0, k1 = self.k
        y = TConv(c_, (k0, k0), padding=[(k0 // 2, k0 // 2)] * 2, use_bias=False,
                    dtype=self.dtype, name="base_conv_0")(x)
        y = _plain_bn(y, train, self.dtype, "base_conv_1")
        y = nn.silu(y)
        y = TConv(self.c2, (k1, k1), padding=[(k1 // 2, k1 // 2)] * 2,
                    feature_group_count=self.g, use_bias=False,
                    dtype=self.dtype, name="base_conv_3")(y)
        y = _plain_bn(y, train, self.dtype, "base_conv_4")
        hidden = int(self.c2 * self.ffn_ratio)
        z = TConv(hidden, (1, 1), use_bias=False, dtype=self.dtype, name="iel_0")(y)
        z = TConv(hidden, (3, 3), padding=[(1, 1)] * 2, feature_group_count=hidden // 4,
                    use_bias=False, dtype=self.dtype, name="iel_1")(z)
        z = nn.silu(z)
        z = TConv(self.c2, (1, 1), use_bias=False, dtype=self.dtype, name="iel_3")(z)
        z = _plain_bn(z, train, self.dtype, "iel_4")
        y = y + z
        return x + y if self.shortcut and c1 == self.c2 else y


class C3kIEL(C3):
    """C3k over IEL bottlenecks (sys block.py:1741 C3k_IEL)."""

    kk: int = 3

    def inner_block(self, c: int, i: int):
        return BottleneckIEL(c, self.shortcut, self.g, k=(self.kk, self.kk), e=1.0,
                             dtype=self.dtype, name=f"m_{i}")


class C3k2_IEL(C2f):
    """C3k2 over IEL bottlenecks (sys block.py:1751)."""

    c3k: bool = False

    def inner_block(self, c: int, i: int):
        if self.c3k:
            return C3kIEL(c, 2, self.shortcut, self.g, dtype=self.dtype, name=f"m_{i}")
        return BottleneckIEL(c, self.shortcut, self.g, dtype=self.dtype, name=f"m_{i}")


# ---------------------------------------------------------------------------
# RetBlock (RMT decayed retention) — reference sys block.py:1268-1810
# ---------------------------------------------------------------------------


class DWConv2dNHWC(nn.Module):
    """sys block.py DWConv2d: depthwise conv over a (B,H,W,C) tensor."""

    k: int
    p: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        C = x.shape[-1]
        return TConv(C, (self.k, self.k), padding=[(self.p, self.p)] * 2,
                       feature_group_count=C, use_bias=True, dtype=self.dtype,
                       name="conv")(x)


def relpos_decay(num_heads: int, initial_value: float = 2.0, heads_range: float = 4.0):
    """RelPos2d per-head decay constants (sys block.py:1530)."""
    ar = np.arange(num_heads, dtype=np.float32) / num_heads
    return np.log(1.0 - 2.0 ** (-initial_value - heads_range * ar))


def relpos_mask_1d(l: int, decay: np.ndarray) -> np.ndarray:
    idx = np.arange(l, dtype=np.float32)
    m = np.abs(idx[:, None] - idx[None, :])
    return m[None] * decay[:, None, None]  # (n, l, l)


def relpos_mask_2d(h: int, w: int, decay: np.ndarray) -> np.ndarray:
    ih, iw = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    grid = np.stack([ih.reshape(-1), iw.reshape(-1)], -1).astype(np.float32)
    m = np.abs(grid[:, None, :] - grid[None, :, :]).sum(-1)
    return m[None] * decay[:, None, None]  # (n, l, l)


class MaSA(nn.Module):
    """Whole-image decayed retention (sys block.py:1406)."""

    embed_dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Array) -> Array:
        B, H, W, C = x.shape
        nh = self.num_heads
        kd = C // nh
        scaling = kd ** -0.5
        q = TDense(C, dtype=self.dtype, name="q_proj")(x)
        k = TDense(C, dtype=self.dtype, name="k_proj")(x) * scaling
        v = TDense(C, dtype=self.dtype, name="v_proj")(x)
        lepe = DWConv2dNHWC(5, 2, dtype=self.dtype, name="lepe")(v)
        L = H * W
        qr = q.reshape(B, L, nh, kd).transpose(0, 2, 1, 3)
        kr = k.reshape(B, L, nh, kd).transpose(0, 2, 1, 3)
        vr = v.reshape(B, L, nh, -1).transpose(0, 2, 1, 3)
        qk = qr @ kr.transpose(0, 1, 3, 2) + mask.astype(q.dtype)
        out = nn.softmax(qk, axis=-1) @ vr  # (B, nh, L, d)
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, C) + lepe
        return TDense(C, dtype=self.dtype, name="out_proj")(out)


class MaSAd(nn.Module):
    """Axially-decomposed (chunk) decayed retention (sys block.py:1316)."""

    embed_dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask_h: Array, mask_w: Array) -> Array:
        B, H, W, C = x.shape
        nh = self.num_heads
        kd = C // nh
        scaling = kd ** -0.5
        q = TDense(C, dtype=self.dtype, name="q_proj")(x)
        k = TDense(C, dtype=self.dtype, name="k_proj")(x) * scaling
        v = TDense(C, dtype=self.dtype, name="v_proj")(x)
        lepe = DWConv2dNHWC(5, 2, dtype=self.dtype, name="lepe")(v)
        qr = q.reshape(B, H, W, nh, kd).transpose(0, 3, 1, 2, 4)  # (B,n,H,W,d)
        kr = k.reshape(B, H, W, nh, kd).transpose(0, 3, 1, 2, 4)
        # width attention: (B,H,n,W,W)
        qr_w = qr.transpose(0, 2, 1, 3, 4)
        kr_w = kr.transpose(0, 2, 1, 3, 4)
        vv = v.reshape(B, H, W, nh, -1).transpose(0, 1, 3, 2, 4)  # (B,H,n,W,d)
        qk_w = qr_w @ kr_w.transpose(0, 1, 2, 4, 3) + mask_w.astype(q.dtype)
        vv = nn.softmax(qk_w, axis=-1) @ vv  # (B,H,n,W,d)
        # height attention: (B,W,n,H,H)
        qr_h = qr.transpose(0, 3, 1, 2, 4)  # (B,W,n,H,d)
        kr_h = kr.transpose(0, 3, 1, 2, 4)
        vv = vv.transpose(0, 3, 2, 1, 4)  # (B,W,n,H,d)
        qk_h = qr_h @ kr_h.transpose(0, 1, 2, 4, 3) + mask_h.astype(q.dtype)
        out = nn.softmax(qk_h, axis=-1) @ vv  # (B,W,n,H,d)
        out = out.transpose(0, 3, 1, 2, 4).reshape(B, H, W, C) + lepe
        return TDense(C, dtype=self.dtype, name="out_proj")(out)


class RetFFN(nn.Module):
    """FeedForwardNetwork (sys block.py:1468), subln/subconv off."""

    embed_dim: int
    ffn_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = TDense(self.ffn_dim, dtype=self.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        return TDense(self.embed_dim, dtype=self.dtype, name="fc2")(h)


class RetBlock(nn.Module):
    """RMT retention block (sys block.py:1464); drop_path=0, layerscale off —
    the only configuration the sys graph wrappers construct."""

    retention: str
    embed_dim: int
    num_heads: int
    ffn_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, rel_pos, train: bool = False) -> Array:
        x = x + DWConv2dNHWC(3, 1, dtype=self.dtype, name="pos")(x)
        normed = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="retention_layer_norm")(x)
        if self.retention == "chunk":
            mask_h, mask_w = rel_pos
            x = x + MaSAd(self.embed_dim, self.num_heads, dtype=self.dtype,
                          name="retention")(normed, mask_h, mask_w)
        else:
            x = x + MaSA(self.embed_dim, self.num_heads, dtype=self.dtype,
                         name="retention")(normed, rel_pos)
        normed = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="final_layer_norm")(x)
        return x + RetFFN(self.embed_dim, self.ffn_dim, dtype=self.dtype, name="ffn")(normed)


def _rel_pos_for(retention: str, h: int, w: int, num_heads: int):
    decay = relpos_decay(num_heads)
    if retention == "chunk":
        return (jnp.asarray(relpos_mask_1d(h, decay)), jnp.asarray(relpos_mask_1d(w, decay)))
    return jnp.asarray(relpos_mask_2d(h, w, decay))


class C3kRetBlock(C3):
    """C3 whose inner stack is RetBlocks (sys block.py:1762 C3k_RetBlock)."""

    retention: str = "chunk"
    num_heads: int = 8

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        B, H, W, C = x.shape
        c_ = int(self.c2 * self.e)
        rel_pos = _rel_pos_for(self.retention, H, W, self.num_heads)
        a = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            a = RetBlock(self.retention, c_, self.num_heads, c_, dtype=self.dtype,
                         name=f"m_{i}")(a, rel_pos, train)
        b = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return ConvBN(self.c2, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], axis=-1), train
        )


class C3k2_RetBlock(C2f):
    """C2f whose inner blocks are RetBlocks / C3k_RetBlock (sys block.py:1783)."""

    retention: str = "chunk"
    num_heads: int = 8
    c3k: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c = int(self.c2 * self.e)
        B, H, W, _ = x.shape
        y = ConvBN(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        rel_pos = None if self.c3k else _rel_pos_for(self.retention, H, W, self.num_heads)
        for i in range(self.n):
            if self.c3k:
                ys.append(C3kRetBlock(c, 2, self.shortcut, self.g,
                                      retention=self.retention, num_heads=self.num_heads,
                                      dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
            else:
                ys.append(RetBlock(self.retention, c, self.num_heads, c, dtype=self.dtype,
                                   name=f"m_{i}")(ys[-1], rel_pos, train))
        return ConvBN(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, axis=-1), train)


# ---------------------------------------------------------------------------
# WTConv2d — reference Addmodules/WTConv.py (wavelet convolution, db1/Haar)
# ---------------------------------------------------------------------------

_SQRT2_INV = 1.0 / math.sqrt(2.0)
# pywt db1 banks after the reference's create_wavelet_filter index gymnastics
_DB1_DEC_LO = np.array([_SQRT2_INV, _SQRT2_INV], np.float32)   # reversed == same
_DB1_DEC_HI = np.array([_SQRT2_INV, -_SQRT2_INV], np.float32)  # dec_hi reversed
_DB1_REC_LO = np.array([_SQRT2_INV, _SQRT2_INV], np.float32)   # reversed+flipped
_DB1_REC_HI = np.array([_SQRT2_INV, -_SQRT2_INV], np.float32)


def _wavelet_bank(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """4 separable 2x2 filters [ll, lh, hl, hh] matching the reference's
    a.unsqueeze(0)*b.unsqueeze(1) outer-product convention (rows = 2nd arg)."""
    return np.stack([
        np.outer(lo, lo), np.outer(hi, lo), np.outer(lo, hi), np.outer(hi, hi)
    ]).astype(np.float32)  # [k, row, col]


def wavelet_transform(x: Array, bank: Array) -> Array:
    """(B,H,W,C) -> (B,H/2,W/2,C,4) one-level DWT (depthwise stride-2 conv)."""
    B, H, W, C = x.shape
    kernel = jnp.tile(bank.transpose(1, 2, 0)[:, :, None, :], (1, 1, 1, C))
    # HWIO (2,2,1,4C) ordered channel-major (c*4+f) to match torch groups conv
    kernel = kernel.reshape(2, 2, 1, 4 * C)
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
    return y.reshape(B, H // 2, W // 2, C, 4)


def inverse_wavelet_transform(x: Array, bank: Array) -> Array:
    """(B,h,w,C,4) -> (B,2h,2w,C): out[2i+di,2j+dj] = sum_f x[...,f]*bank[f,di,dj]."""
    B, h, w, C, _ = x.shape
    y = jnp.einsum("bhwcf,fpq->bhpwqc", x, bank.astype(x.dtype))
    return y.reshape(B, 2 * h, 2 * w, C)


class _Scale(nn.Module):
    """Reference _ScaleModule (WTConv.py:93): learnable per-channel multiplier
    whose param lands at <name>.weight."""

    init_scale: float = 1.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = self.param("weight", nn.initializers.constant(self.init_scale),
                       (x.shape[-1],), jnp.float32)
        return x * w.astype(x.dtype)


class WTConv2d(nn.Module):
    """Wavelet convolution (reference Addmodules/WTConv.py:10): depthwise conv
    on the base band plus per-level depthwise convs on stacked DWT subbands,
    recombined through the inverse transform. db1 (Haar) filters, the
    reference default, are baked constants (non-trainable in torch too)."""

    channels: int
    kernel_size: int = 5
    stride: int = 1
    wt_levels: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        C = self.channels
        k = self.kernel_size
        pad = k // 2
        dec = jnp.asarray(_wavelet_bank(_DB1_DEC_LO, _DB1_DEC_HI))
        rec = jnp.asarray(_wavelet_bank(_DB1_REC_LO, _DB1_REC_HI))

        lls, highs, shapes = [], [], []
        cur = x
        for i in range(self.wt_levels):
            shapes.append(cur.shape)
            if cur.shape[1] % 2 or cur.shape[2] % 2:
                cur = jnp.pad(cur, ((0, 0), (0, cur.shape[1] % 2),
                                    (0, cur.shape[2] % 2), (0, 0)))
            sub = wavelet_transform(cur, dec)  # (B,h,w,C,4)
            cur = sub[..., 0]
            B, h, w, _, _ = sub.shape
            tag = sub.reshape(B, h, w, 4 * C)
            tag = TConv(4 * C, (k, k), padding=[(pad, pad)] * 2, feature_group_count=4 * C,
                          use_bias=False, dtype=self.dtype, name=f"wavelet_convs_{i}")(tag)
            tag = _Scale(0.1, name=f"wavelet_scale_{i}")(tag).reshape(B, h, w, C, 4)
            lls.append(tag[..., 0])
            highs.append(tag[..., 1:])

        nxt = 0.0
        for i in range(self.wt_levels - 1, -1, -1):
            ll = lls[i] + nxt
            sub = jnp.concatenate([ll[..., None], highs[i]], axis=-1)
            nxt = inverse_wavelet_transform(sub, rec)
            sh = shapes[i]
            nxt = nxt[:, :sh[1], :sh[2], :]

        base = TConv(C, (k, k), padding=[(pad, pad)] * 2, feature_group_count=C,
                       use_bias=True, dtype=self.dtype, name="base_conv")(x)
        y = _Scale(1.0, name="base_scale")(base) + nxt
        if self.stride > 1:
            y = y[:, ::self.stride, ::self.stride, :]
        return y


# ---------------------------------------------------------------------------
# CondConv2D — reference Addmodules/condconv.py:26
# ---------------------------------------------------------------------------


class CondConv2D(nn.Module):
    """Conditionally parameterized conv: per-sample expert mixture of kernels
    (routing = sigmoid(Linear(GAP))). The reference loops samples through
    F.conv2d; here the expert mixture is one einsum and the per-sample convs
    are a vmap — both batch onto the MXU."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    num_experts: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        B, H, W, C = x.shape
        k = self.kernel_size
        w = self.param(
            "weight",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform",
                                             in_axis=(2, 3, 4), out_axis=1),
            (self.num_experts, self.out_channels, C // self.groups, k, k), jnp.float32)
        pooled = jnp.mean(x, axis=(1, 2))  # (B, C)
        routing = nn.sigmoid(
            _RoutingFC(self.num_experts, dtype=self.dtype, name="_routing_fn")(pooled))
        # per-sample kernels, HWIO: (B, k, k, C/groups, out)
        kernels = jnp.einsum("be,eoikl->bkloi", routing.astype(self.dtype),
                             w.astype(self.dtype)).transpose(0, 1, 2, 4, 3)

        def conv1(xi, ki):
            return jax.lax.conv_general_dilated(
                xi[None], ki, (self.stride, self.stride),
                [(self.padding, self.padding)] * 2,
                rhs_dilation=(self.dilation, self.dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups)[0]

        y = jax.vmap(conv1)(x, kernels)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class _RoutingFC(nn.Module):
    num_experts: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return TDense(self.num_experts, dtype=self.dtype, name="fc")(x)
