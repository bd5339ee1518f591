"""TPU-native neural network blocks (flax.linen, NHWC, bf16-friendly).

Re-implements the reference block zoo — both the stock YOLO11 modules
(reference: ultralytics/nn/modules/{conv,block,head}.py) and the BS-YOLO fork
blocks (PMSFA block.py:3035, C3k2_gai block.py:3087, SCDown block.py:4503,
MSCAAttention nn/Addmodules/MSCA.py:19, ELA nn/Addmodules/ELA.py:33,
Pinwheel_shapedConv conv.py:153) — as idiomatic JAX:

- NHWC layout throughout (TPU conv-native); channel ops act on axis -1
- BatchNorm uses the reference's eps=1e-3 / momentum=0.03
  (torch_utils.py:417-427 initialize_weights), i.e. linen momentum 0.97
- compute dtype is configurable (bf16 for speed); params stay f32
- no explicit conv+BN fusion pass: in inference mode BN is a per-channel
  affine that XLA fuses into the convolution epilogue automatically

Every module takes `train: bool` to select BN batch/running statistics.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

BN_MOMENTUM = 0.97  # torch momentum 0.03
BN_EPS = 1e-3

# torch's Conv2d/Linear default weight init is kaiming_uniform(a=sqrt(5)):
# uniform(+-sqrt(1/fan_in)), variance 1/(3*fan_in). flax's default
# lecun_normal has 3x that variance; for BN-normalized layers the weight
# norm sets the effective per-layer step size (gradients are orthogonal to
# scale-invariant weights, so |dw|/|w| ~ lr/|w|^2), so a 3x-hotter init
# trains measurably SLOWER at the same lr. Matching the reference's init
# distribution is required for training-DYNAMICS parity
# (tests/test_train_parity.py), not just converted-weight forward parity.
TORCH_INIT = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
# nn.Conv/nn.Dense with the torch-matching kernel init; functools.partial
# keeps the flax class (auto-names stay Conv_N/Dense_N, so checkpoint and
# converter param paths are unchanged).
import functools  # noqa: E402

TConv = functools.partial(nn.Conv, kernel_init=TORCH_INIT)
TDense = functools.partial(nn.Dense, kernel_init=TORCH_INIT)


def autopad(k: int, p: Optional[int] = None, d: int = 1) -> int:
    """Same-shape padding (reference conv.py autopad)."""
    if d > 1:
        k = d * (k - 1) + 1
    return k // 2 if p is None else p


# Trace-time default activation for ConvBN, the analog of the reference's
# Conv.default_act class global (tasks.py parse_model `activation:` key):
# DetectionGraph sets it from ModelSpec.act before walking its layers.
_DEFAULT_ACT = {"name": "silu"}

_ACTS = {
    "silu": nn.silu,
    "relu": nn.relu,
    "lrelu": lambda x: nn.leaky_relu(x, 0.1),
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "hardswish": nn.hard_swish,
    "mish": lambda x: x * jnp.tanh(nn.softplus(x)),
}


def set_default_act(name: str):
    """Set the graph-wide Conv activation ("silu" default; yolov6 uses relu)."""
    _DEFAULT_ACT["name"] = name if name in _ACTS else "silu"


def default_act():
    return _DEFAULT_ACT["name"]


# Trace-time int8-inference switch (docs/performance.md lever: the v5e MXU
# runs int8 at ~2x bf16 peak, measured 355 vs 172 TFLOP/s on a saturating
# conv). When enabled, ConvBN performs the convolution as an int8 matmul —
# int8 x int8 -> int32 on the MXU, dequantized into the same BN + act tail.
# Two activation-scale modes:
#   dynamic — per-tensor scale computed in-graph from the live values (a
#             full abs-max reduction per conv: correct anywhere, but the
#             reduction + unfused quant pass makes it SLOWER end-to-end;
#             kept as the measured negative + calibration-free fallback);
#   static  — scale is a trace-time constant from a calibration pass
#             (nn/quant.py:calibrate_int8), so XLA fuses the round/clip/
#             cast into the previous layer's epilogue and the conv reads
#             int8 from HBM (half the bytes of bf16).
# Weight scales are per-out-channel from the live f32/bf16 params in both
# modes — no separate checkpoint; composes with every converted model.
_QUANT = {"int8": False, "scales": None, "calibrate": False}


def set_int8_inference(enabled: bool, scales: dict = None):
    """Enable/disable int8 conv inference graph-wide (trace-time).

    ``scales``: optional {module_path: activation_absmax} from
    ``nn.quant.calibrate_int8`` — supplies static per-conv activation
    scales; convs missing from the dict fall back to dynamic scaling.

    The switch is read at TRACE time: functions already traced/compiled
    (jax.jit caches per function object + avals) keep the path they were
    traced with. Flip the switch BEFORE the first jitted call, or jit a
    fresh function afterwards — re-calling `jax.jit(same_fn)` silently
    reuses the old trace.
    """
    _QUANT["int8"] = bool(enabled)
    _QUANT["scales"] = dict(scales) if scales else None


def int8_inference() -> bool:
    return _QUANT["int8"]


def set_int8_calibration(enabled: bool):
    """During calibration, convs run float and sow their input abs-max
    into the "intermediates" collection (harvested by calibrate_int8)."""
    _QUANT["calibrate"] = bool(enabled)


class _RawConv(nn.Module):
    """Bias-free conv executing either the standard dtype path (identical
    math to flax nn.Conv) or the dynamic-int8 MXU path. Lives under the
    name "conv" inside ConvBN so parameter paths (m{i}/conv/kernel, HWIO)
    stay converter- and checkpoint-compatible."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Any
    feature_group_count: int = 1
    kernel_dilation: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, int8: bool = False) -> Array:
        c1 = x.shape[-1]
        kshape = (*self.kernel_size, c1 // self.feature_group_count, self.features)
        kernel = self.param("kernel", TORCH_INIT, kshape, jnp.float32)
        dn = jax.lax.conv_dimension_numbers(x.shape, kshape, ("NHWC", "HWIO", "NHWC"))
        if _QUANT["calibrate"] and self.feature_group_count == 1:
            int8 = False
            self.sow("intermediates", "act_absmax", jnp.max(jnp.abs(x.astype(jnp.float32))))
        if int8 and self.feature_group_count == 1:
            # int8 x int8 -> int32 on the MXU (v5e: ~2x bf16 peak), per-out-
            # channel weight scale, dequantized straight into the BN tail.
            # Depthwise/groups stay bf16 (VPU-bound; int8 wins nothing there).
            xf = x.astype(jnp.float32)
            kf = kernel.astype(jnp.float32)
            amax = None
            if _QUANT["scales"] is not None:
                amax = _QUANT["scales"].get("/".join(self.scope.path))
            if amax is not None:  # static: scale is a compile-time constant
                sx = jnp.float32(max(float(amax), 1e-8) / 127.0)
            else:  # dynamic: live per-tensor abs-max reduction
                sx = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
            xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
            sw = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-12) / 127.0
            wq = jnp.clip(jnp.round(kf / sw), -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, wq, window_strides=self.strides, padding=self.padding,
                rhs_dilation=self.kernel_dilation, dimension_numbers=dn,
                feature_group_count=1, preferred_element_type=jnp.int32,
            )
            return (y.astype(jnp.float32) * (sx * sw)).astype(self.dtype)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=self.strides, padding=self.padding,
            rhs_dilation=self.kernel_dilation, dimension_numbers=dn,
            feature_group_count=self.feature_group_count,
        )


class ConvBN(nn.Module):
    """Conv2d + BatchNorm + act (reference Conv, conv.py:133). ``act=True``
    uses the graph default (SiLU unless the YAML overrides `activation:`)."""

    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    d: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        pad = autopad(self.k, self.p, self.d)
        x = _RawConv(
            features=self.c2,
            kernel_size=(self.k, self.k),
            strides=(self.s, self.s),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.g,
            kernel_dilation=(self.d, self.d),
            dtype=self.dtype,
            name="conv",
        )(x, int8=_QUANT["int8"] and not train)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn",
        )(x)
        return _ACTS[_DEFAULT_ACT["name"]](x) if self.act else x


class DWConvBN(nn.Module):
    """Depthwise Conv + BN + SiLU (reference DWConv, conv.py:224). g=gcd(c1,c2)."""

    c2: int
    k: int = 1
    s: int = 1
    d: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c1 = x.shape[-1]
        g = math.gcd(c1, self.c2)
        return ConvBN(self.c2, self.k, self.s, g=g, d=self.d, act=self.act, dtype=self.dtype, name="dw")(
            x, train
        )


class Bottleneck(nn.Module):
    """Standard bottleneck (reference block.py Bottleneck)."""

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
        return x + y if self.shortcut and c1 == self.c2 else y


class C2f(nn.Module):
    """CSP bottleneck, 2 convolutions, fast variant (reference block.py:3295)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    def inner_block(self, c: int, i: int):
        return Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0, dtype=self.dtype, name=f"m_{i}")

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            ys.append(self.inner_block(c, i)(ys[-1], train))
        return ConvBN(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class C2(nn.Module):
    """CSP bottleneck with 2 convolutions (reference block.py:3277)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        for i in range(self.n):
            a = Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0, dtype=self.dtype, name=f"m_{i}")(a, train)
        return ConvBN(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate([a, b], axis=-1), train)


class C3(nn.Module):
    """CSP bottleneck with 3 convolutions (reference block.py:3320)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    def inner_block(self, c: int, i: int):
        return Bottleneck(c, self.shortcut, self.g, k=(1, 3), e=1.0, dtype=self.dtype, name=f"m_{i}")

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c_ = int(self.c2 * self.e)
        a = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        b = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = self.inner_block(c_, i)(a, train)
        return ConvBN(self.c2, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], axis=-1), train)


class C3k(C3):
    """C3 with configurable kernel (reference block.py:3807); k=(k,k) bottlenecks."""

    kk: int = 3

    def inner_block(self, c: int, i: int):
        return Bottleneck(c, self.shortcut, self.g, k=(self.kk, self.kk), e=1.0, dtype=self.dtype, name=f"m_{i}")


class C3k2(C2f):
    """C2f whose inner blocks are C3k(n=2) or Bottleneck (reference block.py:3796)."""

    c3k: bool = False

    def inner_block(self, c: int, i: int):
        if self.c3k:
            return C3k(c, 2, self.shortcut, self.g, dtype=self.dtype, name=f"m_{i}")
        return Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=0.5, dtype=self.dtype, name=f"m_{i}")


class PMSFA(nn.Module):
    """Progressive multi-scale feature aggregation (fork block, reference block.py:3035).

    3x3 conv -> half goes through 5x5 DW -> quarter through 7x7 DW; concat
    [quarter, quarter, half] -> 1x1 conv + residual.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        inc = x.shape[-1]
        c1 = ConvBN(inc, 3, dtype=self.dtype, name="conv1")(x, train)
        c1a, c1b = jnp.split(c1, 2, axis=-1)
        c2 = ConvBN(inc // 2, 5, g=inc // 2, dtype=self.dtype, name="conv2")(c1a, train)
        c2a, c2b = jnp.split(c2, 2, axis=-1)
        c3 = ConvBN(inc // 4, 7, g=inc // 4, dtype=self.dtype, name="conv3")(c2a, train)
        out = jnp.concatenate([c3, c2b, c1b], axis=-1)
        return ConvBN(inc, 1, dtype=self.dtype, name="conv4")(out, train) + x


class C3k_gai(C3):
    """C3 whose inner blocks are PMSFA (fork block, reference block.py:3078)."""

    def inner_block(self, c: int, i: int):
        return PMSFA(dtype=self.dtype, name=f"m_{i}")


class C3k2_gai(C2f):
    """C2f whose inner blocks are C3k_gai(n=2) or PMSFA (fork block, block.py:3087)."""

    c3k: bool = False

    def inner_block(self, c: int, i: int):
        if self.c3k:
            return C3k_gai(c, 2, self.shortcut, self.g, dtype=self.dtype, name=f"m_{i}")
        return PMSFA(dtype=self.dtype, name=f"m_{i}")


class SPPF(nn.Module):
    """Spatial pyramid pooling - fast (reference block.py:3114)."""

    c2: int
    k: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c_ = x.shape[-1] // 2
        y = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        p = self.k // 2
        pool = lambda t: nn.max_pool(
            t, window_shape=(self.k, self.k), strides=(1, 1), padding=[(p, p), (p, p)]
        )
        y1 = pool(y)
        y2 = pool(y1)
        y3 = pool(y2)
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([y, y1, y2, y3], axis=-1), train
        )


class SCDown(nn.Module):
    """Separable-conv downsampling from YOLOv10 (reference block.py:4503)."""

    c2: int
    k: int = 3
    s: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        y = ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        return ConvBN(self.c2, self.k, self.s, g=self.c2, act=False, dtype=self.dtype, name="cv2")(y, train)


class Attention(nn.Module):
    """Spatial MHSA over the flattened feature map (reference block.py:4235).

    qkv/proj are 1x1 convs; pe is a 3x3 depthwise positional conv on v.
    """

    dim: int
    num_heads: int = 8
    attn_ratio: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        B, H, W, C = x.shape
        N = H * W
        head_dim = self.dim // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        scale = key_dim**-0.5
        nh_kd = key_dim * self.num_heads
        h = self.dim + nh_kd * 2
        qkv = ConvBN(h, 1, act=False, dtype=self.dtype, name="qkv")(x, train)
        # (B, N, num_heads, 2*key_dim + head_dim) -> per-head split
        qkv = qkv.reshape(B, N, self.num_heads, key_dim * 2 + head_dim)
        q, k, v = jnp.split(qkv, [key_dim, key_dim * 2], axis=-1)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
        out = out.reshape(B, H, W, C)
        v_img = v.reshape(B, H, W, C)
        pe = ConvBN(self.dim, 3, 1, g=self.dim, act=False, dtype=self.dtype, name="pe")(v_img, train)
        return ConvBN(self.dim, 1, act=False, dtype=self.dtype, name="proj")(out + pe, train)


class PSABlock(nn.Module):
    """Attention + conv FFN with shortcuts (reference block.py:4348)."""

    c: int
    attn_ratio: float = 0.5
    num_heads: int = 4
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        a = Attention(self.c, self.num_heads, self.attn_ratio, dtype=self.dtype, name="attn")(x, train)
        x = x + a if self.shortcut else a
        f = ConvBN(self.c * 2, 1, dtype=self.dtype, name="ffn_0")(x, train)
        f = ConvBN(self.c, 1, act=False, dtype=self.dtype, name="ffn_1")(f, train)
        return x + f if self.shortcut else f


class C2PSA(nn.Module):
    """CSP wrapper around n PSABlocks (reference block.py:4429)."""

    c2: int
    n: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        for i in range(self.n):
            b = PSABlock(c, 0.5, max(1, c // 64), dtype=self.dtype, name=f"m_{i}")(b, train)
        return ConvBN(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate([a, b], axis=-1), train)


class PSA(nn.Module):
    """Single-block PSA (reference block.py PSA)."""

    c2: int
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        # reference PSA holds attn/ffn directly on the module (block.py PSA),
        # unlike C2PSA's m.<i> PSABlock list — names must match for .pt import
        att = Attention(c, max(1, c // 64), 0.5, dtype=self.dtype, name="attn")(b, train)
        b = b + att
        f = ConvBN(c * 2, 1, dtype=self.dtype, name="ffn_0")(b, train)
        f = ConvBN(c, 1, act=False, dtype=self.dtype, name="ffn_1")(f, train)
        b = b + f
        return ConvBN(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate([a, b], axis=-1), train)


def _dw_conv2d(x, features, kernel, padding, name, dtype, bias=True, dilation=(1, 1)):
    """Raw depthwise conv2d with bias (torch nn.Conv2d(groups=dim) equivalent)."""
    return TConv(
        features=features,
        kernel_size=kernel,
        padding=padding,
        feature_group_count=features,
        kernel_dilation=dilation,
        use_bias=bias,
        dtype=dtype,
        name=name,
    )(x)


class MSCAAttention(nn.Module):
    """SegNeXt multi-scale strip-conv attention + per-branch SE gating.

    Fork block (reference nn/Addmodules/MSCA.py:19-91): 5x5 DW base, then
    three strip-conv branches (5, 7, 11-tap pairs) + a 21-tap branch; branch
    weights from GAP->1x1 SE convs, sigmoid+softmax over the 4 branches;
    1x1 mixing conv; multiplicative gate on the input.
    """

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        d = self.dim
        u = x
        attn = _dw_conv2d(x, d, (5, 5), [(2, 2), (2, 2)], "conv0", self.dtype)

        def strip(t, k, name):
            t = _dw_conv2d(t, d, (1, k), [(0, 0), (k // 2, k // 2)], f"{name}_1", self.dtype)
            return _dw_conv2d(t, d, (k, 1), [(k // 2, k // 2), (0, 0)], f"{name}_2", self.dtype)

        # The 1x1 "dilconv" is shared across branches 0-2 in the reference
        dilconv = TConv(d, (1, 1), feature_group_count=d, use_bias=True, dtype=self.dtype, name="dilconv")
        attn_0 = dilconv(strip(attn, 5, "conv0"))
        attn_1 = dilconv(strip(attn, 7, "conv1"))
        attn_2 = dilconv(strip(attn, 11, "conv2"))
        attn_3 = strip(attn, 21, "conv3")

        def se(t, name):
            g = jnp.mean(t, axis=(1, 2), keepdims=True)  # GAP (B,1,1,C)
            return TConv(d, (1, 1), use_bias=True, dtype=self.dtype, name=name)(g)

        w = jnp.stack(
            [se(attn_0, "SE1"), se(attn_1, "SE2"), se(attn_2, "SE3"), se(attn_3, "SE4")], axis=0
        )  # (4, B, 1, 1, C)
        w = jax.nn.softmax(jax.nn.sigmoid(w), axis=0)
        x_att = w[0] * attn_0 + w[1] * attn_1 + w[2] * attn_2 + w[3] * attn_3
        attn = TConv(d, (1, 1), use_bias=True, dtype=self.dtype, name="conv4")(x_att)
        return attn * u


class ELA(nn.Module):
    """Efficient local attention, fork variant (reference nn/Addmodules/ELA.py:33-119).

    Channel branch: GAP -> depthwise 1D conv -> sigmoid. Spatial branch:
    H-mean / W-mean -> shared dilated depthwise 1D conv -> GroupNorm ->
    sigmoid -> outer product. Learnable sigmoid-gated fusion + residual.
    """

    channel: int
    b: int = 1
    gamma: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        B, H, W, C = x.shape
        ks = int(abs((math.log(self.channel, 2) + self.b) / self.gamma))
        ks = ks if ks % 2 else ks + 1
        pad_ch = (ks - 1) // 2
        pad_sp = (ks - 1) * 2 // 2

        # shared spatial conv (applied to both H and W sequences)
        spatial_conv = TConv(
            C,
            (ks,),
            padding=[(pad_sp, pad_sp)],
            feature_group_count=C,
            kernel_dilation=(2,),
            use_bias=False,
            dtype=self.dtype,
            name="spatial_conv",
        )
        gn = nn.GroupNorm(num_groups=max(1, C // 16), epsilon=1e-5, dtype=self.dtype, name="gn")

        # channel attention: GAP -> (B, 1, C) -> dw conv1d k=ks -> sigmoid
        gap = jnp.mean(x, axis=(1, 2), keepdims=False)[:, None, :]  # (B, 1, C)
        ch = TConv(
            C,
            (ks,),
            padding=[(pad_ch, pad_ch)],
            feature_group_count=C,
            use_bias=False,
            dtype=self.dtype,
            name="ch_conv",
        )(gap)
        ch_att = jax.nn.sigmoid(ch)[:, :, None, :]  # (B, 1, 1, C)

        x_h = jnp.mean(x, axis=2)  # (B, H, C)
        h_att = jax.nn.sigmoid(gn(spatial_conv(x_h)))[:, :, None, :]  # (B, H, 1, C)
        x_w = jnp.mean(x, axis=1)  # (B, W, C)
        w_att = jax.nn.sigmoid(gn(spatial_conv(x_w)))[:, None, :, :]  # (B, 1, W, C)

        ch_w = jax.nn.sigmoid(self.param("ch_weight", nn.initializers.zeros, (1,)))
        sp_w = jax.nn.sigmoid(self.param("sp_weight", nn.initializers.zeros, (1,)))
        res_w = jax.nn.sigmoid(self.param("res_weight", nn.initializers.zeros, (1,)))
        att_mask = ch_w * ch_att + sp_w * (h_att * w_att)
        return x * att_mask + res_w * x


class ConvBNRect(nn.Module):
    """ConvBN with a rectangular kernel (used by PinwheelConv strips)."""

    c2: int
    kernel: Tuple[int, int]
    s: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = TConv(
            self.c2,
            self.kernel,
            strides=(self.s, self.s),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype, name="bn"
        )(x)
        return _ACTS[_DEFAULT_ACT["name"]](x) if self.act else x


class PinwheelConv(nn.Module):
    """Pinwheel-shaped conv via asymmetric padding (reference conv.py:153-179).

    Shared (1,k) and (k,1) strip ConvBNs applied to 4 asymmetrically padded
    views, concatenated, then a 2x2 valid ConvBN mixes them.
    """

    c2: int
    k: int
    s: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        k, s = self.k, self.s
        c = self.c2 // 4
        # torch ZeroPad2d padding order: (left, right, top, bottom)
        p = [(k, 0, 1, 0), (0, k, 0, 1), (0, 1, k, 0), (1, 0, 0, k)]
        cw = ConvBNRect(c, (1, k), s, dtype=self.dtype, name="cw")
        ch = ConvBNRect(c, (k, 1), s, dtype=self.dtype, name="ch")

        def padded(pad):
            left, right, top, bottom = pad
            return jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)))

        yw0 = cw(padded(p[0]), train)
        yw1 = cw(padded(p[1]), train)
        yh0 = ch(padded(p[2]), train)
        yh1 = ch(padded(p[3]), train)
        out = jnp.concatenate([yw0, yw1, yh0, yh1], axis=-1)
        return ConvBNRect(self.c2, (2, 2), 1, dtype=self.dtype, name="cat")(out, train)


class GhostConv(nn.Module):
    """Ghost convolution (reference conv.py:280): a primary k-conv producing
    c2/2 channels plus a cheap 5x5 depthwise "ghost" branch, concatenated."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c_ = self.c2 // 2
        y = ConvBN(c_, self.k, self.s, g=self.g, act=self.act, dtype=self.dtype, name="cv1")(x, train)
        z = ConvBN(c_, 5, 1, g=c_, act=self.act, dtype=self.dtype, name="cv2")(y, train)
        return jnp.concatenate([y, z], axis=-1)


class GhostBottleneck(nn.Module):
    """Ghost bottleneck (reference block.py:3384): pw GhostConv -> optional
    stride-2 DW -> linear pw GhostConv, with a DW+pw shortcut when s=2.
    Child names mirror the torch nn.Sequential indices (conv.0/1/2,
    shortcut.0/1) for the weight converter."""

    c2: int
    k: int = 3
    s: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, dtype=self.dtype, name="conv_0")(x, train)
        if self.s == 2:
            y = DWConvBN(c_, self.k, self.s, act=False, dtype=self.dtype, name="conv_1")(y, train)
        y = GhostConv(self.c2, 1, 1, act=False, dtype=self.dtype, name="conv_2")(y, train)
        if self.s == 2:
            sc = DWConvBN(x.shape[-1], self.k, self.s, act=False, dtype=self.dtype, name="shortcut_0")(x, train)
            sc = ConvBN(self.c2, 1, 1, act=False, dtype=self.dtype, name="shortcut_1")(sc, train)
        else:
            sc = x
        return y + sc


class C3Ghost(C3):
    """C3 whose inner blocks are GhostBottlenecks (reference block.py:3374)."""

    def inner_block(self, c: int, i: int):
        return GhostBottleneck(c, 3, 1, dtype=self.dtype, name=f"m_{i}")


class SPP(nn.Module):
    """Spatial pyramid pooling, parallel k in (5,9,13) (reference block.py:155)."""

    c2: int
    k: Tuple[int, ...] = (5, 9, 13)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c_ = x.shape[-1] // 2
        y = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        pools = [
            nn.max_pool(y, window_shape=(k, k), strides=(1, 1), padding=[(k // 2, k // 2)] * 2)
            for k in self.k
        ]
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([y] + pools, axis=-1), train
        )


def max_pool2d(x: Array, k: int, s: int, p: int = 0) -> Array:
    """nn.MaxPool2d(k, s, p) as a stateless graph op (yolov3-tiny backbone)."""
    pad = [(p, p), (p, p)]
    return nn.max_pool(x, window_shape=(k, k), strides=(s, s), padding=pad)


def zero_pad2d(x: Array, pad: Tuple[int, int, int, int]) -> Array:
    """nn.ZeroPad2d((left, right, top, bottom)) on NHWC."""
    l, r, t, b = pad
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))


def upsample2x_nearest(x: Array) -> Array:
    """nn.Upsample(scale_factor=2, mode='nearest') equivalent."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


def space_to_depth(x: Array, block: int) -> Array:
    """Lossless (B,H,W,C) -> (B,H/b,W/b,b*b*C) pixel unshuffle.

    The `-tpu` stem (cfg/models/11/yolo11-tpu.yaml): the standard stem conv
    contracts over K = 3x3x3 = 27 of the MXU's 128 contraction lanes (~2.6%
    fill, docs/performance.md). Re-laying the 640x640x3 image as 160x160x48
    before the first conv lifts its contraction to 3x3x48 = 432 lanes (full)
    at identical information content and FLOPs-per-pixel. Channel-last order
    matches jnp.reshape row-major: out channel = (dy, dx, c)."""
    B, H, W, C = x.shape
    b = block
    x = x.reshape(B, H // b, b, W // b, b, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // b, W // b, b * b * C)


def dfl_decode(dist_logits: Array, reg_max: int = 16) -> Array:
    """Distribution Focal Loss integral decode (reference block.py DFL:58).

    dist_logits: (..., 4*reg_max) side-major layout -> (..., 4) expected dists.
    """
    shape = dist_logits.shape
    logits = dist_logits.reshape(shape[:-1] + (4, reg_max))
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    proj = jnp.arange(reg_max, dtype=jnp.float32)
    return probs @ proj


class RepVGGDW(nn.Module):
    """Re-parameterizable depthwise block (reference block.py:3818): a 7x7
    and a 3x3 depthwise conv summed, SiLU. (Deploy-time branch fusion is a
    pure weight transform; XLA fuses the parallel convs' epilogues anyway.)"""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        ed = x.shape[-1]
        a = ConvBN(ed, 7, 1, p=3, g=ed, act=False, dtype=self.dtype, name="conv")(x, train)
        b = ConvBN(ed, 3, 1, p=1, g=ed, act=False, dtype=self.dtype, name="conv1")(x, train)
        return nn.silu(a + b)


class CIB(nn.Module):
    """Conditional identity block from YOLOv10 (reference block.py:4176)."""

    c2: int
    shortcut: bool = True
    e: float = 0.5
    lk: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = ConvBN(c1, 3, g=c1, dtype=self.dtype, name="cv1_0")(x, train)
        y = ConvBN(2 * c_, 1, dtype=self.dtype, name="cv1_1")(y, train)
        if self.lk:
            y = RepVGGDW(dtype=self.dtype, name="cv1_2")(y, train)
        else:
            y = ConvBN(2 * c_, 3, g=2 * c_, dtype=self.dtype, name="cv1_2")(y, train)
        y = ConvBN(self.c2, 1, dtype=self.dtype, name="cv1_3")(y, train)
        y = ConvBN(self.c2, 3, g=self.c2, dtype=self.dtype, name="cv1_4")(y, train)
        return x + y if self.shortcut and c1 == self.c2 else y


class C2fCIB(C2f):
    """C2f with CIB inner blocks (reference block.py:4215)."""

    lk: bool = False

    def inner_block(self, c: int, i: int):
        return CIB(c, self.shortcut, e=1.0, lk=self.lk, dtype=self.dtype, name=f"m_{i}")


def adaptive_max_pool2d(x: Array, k: int) -> Array:
    """torch AdaptiveMaxPool2d((k, k)) for NHWC with static shapes:
    region i spans [floor(i*S/k), ceil((i+1)*S/k))."""
    B, H, W, C = x.shape
    rows = []
    for i in range(k):
        h0, h1 = (i * H) // k, -(-((i + 1) * H) // k)
        cols = []
        for j in range(k):
            w0, w1 = (j * W) // k, -(-((j + 1) * W) // k)
            cols.append(jnp.max(x[:, h0:h1, w0:w1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, k, k, C)


class MaxSigmoidAttnBlock(nn.Module):
    """Text-guided max-sigmoid attention (reference block.py:3483)."""

    c2: int
    nh: int = 1
    ec: int = 128
    gc: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, guide: Array, train: bool = False) -> Array:
        B, H, W, c1 = x.shape
        hc = self.c2 // self.nh
        embed = (
            ConvBN(self.ec, 1, act=False, dtype=self.dtype, name="ec")(x, train)
            if c1 != self.ec
            else x
        )
        g = TDense(self.ec, dtype=self.dtype, name="gl")(guide)  # (B, K, ec)
        g = g.reshape(B, -1, self.nh, self.ec // self.nh)
        e = embed.reshape(B, H, W, self.nh, self.ec // self.nh)
        aw = jnp.einsum("bhwmc,bnmc->bmhwn", e, g, preferred_element_type=jnp.float32)
        aw = jnp.max(aw, axis=-1) / (hc**0.5)
        bias = self.param("bias", nn.initializers.zeros, (self.nh,))
        aw = jax.nn.sigmoid(aw + bias[None, :, None, None]).astype(x.dtype)  # (B, nh, H, W)
        y = ConvBN(self.c2, 3, act=False, dtype=self.dtype, name="proj_conv")(x, train)
        y = y.reshape(B, H, W, self.nh, hc) * aw.transpose(0, 2, 3, 1)[..., None]
        return y.reshape(B, H, W, self.c2)


class C2fAttn(nn.Module):
    """C2f with a trailing text-guided attention branch (reference block.py:3518)."""

    c2: int
    n: int = 1
    ec: int = 128
    nh: int = 1
    gc: int = 512
    shortcut: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, guide: Array, train: bool = False) -> Array:
        c = int(self.c2 * 0.5)
        y = ConvBN(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            ys.append(
                Bottleneck(c, self.shortcut, k=(3, 3), e=1.0, dtype=self.dtype, name=f"m_{i}")(
                    ys[-1], train
                )
            )
        ys.append(
            MaxSigmoidAttnBlock(c, self.nh, self.ec, self.gc, dtype=self.dtype, name="attn")(
                ys[-1], guide, train
            )
        )
        return ConvBN(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class ImagePoolingAttn(nn.Module):
    """Text features attend over pooled image features (reference block.py:3545)."""

    ec: int = 256
    ch: Tuple[int, ...] = ()
    ct: int = 512
    nh: int = 8
    k: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[Array], text: Array, train: bool = False) -> Array:
        B = feats[0].shape[0]
        hc = self.ec // self.nh
        pooled = []
        for i, f in enumerate(feats):
            p = TConv(self.ec, (1, 1), use_bias=True, dtype=self.dtype, name=f"projections_{i}")(f)
            pooled.append(adaptive_max_pool2d(p, self.k).reshape(B, self.k * self.k, self.ec))
        img = jnp.concatenate(pooled, axis=1)  # (B, nf*k*k, ec)

        q = nn.LayerNorm(dtype=self.dtype, name="query_0")(text)
        q = TDense(self.ec, dtype=self.dtype, name="query_1")(q)
        kk = nn.LayerNorm(dtype=self.dtype, name="key_0")(img)
        kk = TDense(self.ec, dtype=self.dtype, name="key_1")(kk)
        v = nn.LayerNorm(dtype=self.dtype, name="value_0")(img)
        v = TDense(self.ec, dtype=self.dtype, name="value_1")(v)

        q = q.reshape(B, -1, self.nh, hc)
        kk = kk.reshape(B, -1, self.nh, hc)
        v = v.reshape(B, -1, self.nh, hc)
        aw = jnp.einsum("bnmc,bkmc->bmnk", q, kk, preferred_element_type=jnp.float32) / (hc**0.5)
        aw = jax.nn.softmax(aw, axis=-1).astype(v.dtype)
        out = jnp.einsum("bmnk,bkmc->bnmc", aw, v).reshape(B, -1, self.ec)
        out = TDense(self.ct, dtype=self.dtype, name="proj")(out)
        return out + text  # reference scale=False -> scale == 1.0? (it is 1.0 when scale=False)


class ContrastiveHead(nn.Module):
    """Region-text similarity logits (reference block.py:3591)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, w: Array, train: bool = False) -> Array:
        bias = self.param("bias", nn.initializers.constant(-10.0), (1,))
        logit_scale = self.param(
            "logit_scale", nn.initializers.constant(math.log(1 / 0.07)), ()
        )
        x = x / (jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True) + 1e-12)
        w = w / (jnp.linalg.norm(w.astype(jnp.float32), axis=-1, keepdims=True) + 1e-12)
        sim = jnp.einsum("bhwc,bkc->bhwk", x, w, preferred_element_type=jnp.float32)
        return sim * jnp.exp(logit_scale) + bias


class BNContrastiveHead(nn.Module):
    """ContrastiveHead with BatchNorm instead of image-side L2 norm
    (reference block.py:3609)."""

    embed_dims: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, w: Array, train: bool = False) -> Array:
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=self.dtype, name="norm",
        )(x)
        bias = self.param("bias", nn.initializers.constant(-10.0), (1,))
        logit_scale = self.param("logit_scale", nn.initializers.constant(-1.0), ())
        w = w / (jnp.linalg.norm(w.astype(jnp.float32), axis=-1, keepdims=True) + 1e-12)
        sim = jnp.einsum("bhwc,bkc->bhwk", x.astype(jnp.float32), w, preferred_element_type=jnp.float32)
        return sim * jnp.exp(logit_scale) + bias


class LightConv(nn.Module):
    """1x1 conv + depthwise kxk, ReLU on the DW only (reference conv.py:206)."""

    c2: int
    k: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = ConvBN(self.c2, 1, act=False, dtype=self.dtype, name="conv1")(x, train)
        x = ConvBN(self.c2, self.k, g=self.c2, act=False, dtype=self.dtype, name="conv2")(x, train)
        return nn.relu(x)


class HGStem(nn.Module):
    """PPHGNetV2 stem: 5 ReLU convs + stride-1 maxpool branch
    (reference block.py:100)."""

    cm: int
    c2: int
    dtype: Any = jnp.float32

    def _conv(self, c, k, s, p, name):
        return ConvBN(c, k, s, p=p, act=False, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cm = self.cm
        x = nn.relu(self._conv(cm, 3, 2, None, "stem1")(x, train))
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))  # F.pad [0,1,0,1]
        x2 = nn.relu(self._conv(cm // 2, 2, 1, 0, "stem2a")(x, train))
        x2 = jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = nn.relu(self._conv(cm, 2, 1, 0, "stem2b")(x2, train))
        # MaxPool2d(2, stride=1, ceil_mode=True) on the padded map: with the
        # extra pad row/col the ceil and floor shapes coincide
        x1 = nn.max_pool(x, (2, 2), strides=(1, 1))
        x = jnp.concatenate([x1, x2], axis=-1)
        x = nn.relu(self._conv(cm, 3, 2, None, "stem3")(x, train))
        return nn.relu(self._conv(self.c2, 1, 1, None, "stem4")(x, train))


class HGBlock(nn.Module):
    """PPHGNetV2 HG block: n chained (Light)Convs + squeeze/excite 1x1s
    (reference block.py:131)."""

    cm: int
    c2: int
    k: int = 3
    n: int = 6
    lightconv: bool = False
    shortcut: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c1 = x.shape[-1]
        ys = [x]
        for i in range(self.n):
            if self.lightconv:
                ys.append(LightConv(self.cm, self.k, dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
            else:
                y = ConvBN(self.cm, self.k, act=False, dtype=self.dtype, name=f"m_{i}")(ys[-1], train)
                ys.append(nn.relu(y))
        y = jnp.concatenate(ys, axis=-1)
        y = nn.relu(ConvBN(self.c2 // 2, 1, act=False, dtype=self.dtype, name="sc")(y, train))
        y = nn.relu(ConvBN(self.c2, 1, act=False, dtype=self.dtype, name="ec")(y, train))
        return y + x if self.shortcut and c1 == self.c2 else y


class RepConv(nn.Module):
    """RepVGG-style 3x3 + 1x1 parallel convs, SiLU (reference conv.py:296;
    deploy-time fusion is a pure weight transform left to the exporter)."""

    c2: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        a = ConvBN(self.c2, 3, 1, p=1, act=False, dtype=self.dtype, name="conv1")(x, train)
        b = ConvBN(self.c2, 1, 1, p=0, act=False, dtype=self.dtype, name="conv2")(x, train)
        return nn.silu(a + b)


class RepC3(nn.Module):
    """CSP block with RepConv stack (reference block.py:3347); used by the
    RT-DETR neck."""

    c2: int
    n: int = 3
    e: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c_ = int(self.c2 * self.e)
        a = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        b = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = RepConv(c_, dtype=self.dtype, name=f"m_{i}")(a, train)
        y = a + b
        if c_ != self.c2:
            y = ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv3")(y, train)
        return y


class RepBottleneck(Bottleneck):
    """Bottleneck whose first conv is a RepConv (reference block.py:3634)."""

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = RepConv(c_, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBN(self.c2, self.k[1], 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and c1 == self.c2 else y


class RepCSP(C3):
    """C3 with RepBottleneck inner blocks (reference block.py:3644)."""

    def inner_block(self, c: int, i: int):
        return RepBottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0, dtype=self.dtype, name=f"m_{i}")


class RepNCSPELAN4(nn.Module):
    """GELAN CSP-ELAN block (reference block.py:3654; YOLOv9 backbone/neck)."""

    c2: int
    c3: int
    c4: int
    n: int = 1
    dtype: Any = jnp.float32

    def _branch(self, c_in: int, idx: int):
        def run(x, train):
            y = RepCSP(self.c4, self.n, dtype=self.dtype, name=f"cv{idx}_0")(x, train)
            return ConvBN(self.c4, 3, 1, dtype=self.dtype, name=f"cv{idx}_1")(y, train)

        return run

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        y = ConvBN(self.c3, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        ys.append(self._branch(self.c3 // 2, 2)(ys[-1], train))
        ys.append(self._branch(self.c4, 3)(ys[-1], train))
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv4")(jnp.concatenate(ys, axis=-1), train)


class ELAN1(nn.Module):
    """Light ELAN with plain convs (reference block.py:3679; YOLOv9t)."""

    c2: int
    c3: int
    c4: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        y = ConvBN(self.c3, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        ys.append(ConvBN(self.c4, 3, 1, dtype=self.dtype, name="cv2")(ys[-1], train))
        ys.append(ConvBN(self.c4, 3, 1, dtype=self.dtype, name="cv3")(ys[-1], train))
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv4")(jnp.concatenate(ys, axis=-1), train)


def _avgpool2_s1(x: Array) -> Array:
    """F.avg_pool2d(x, 2, 1, 0) — k2 s1 valid (reference AConv/ADown prelude)."""
    return nn.avg_pool(x, (2, 2), strides=(1, 1), padding="VALID")


class AConv(nn.Module):
    """avg-pool smoothed stride-2 conv (reference block.py:3692)."""

    c2: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        return ConvBN(self.c2, 3, 2, p=1, dtype=self.dtype, name="cv1")(_avgpool2_s1(x), train)


class ADown(nn.Module):
    """Dual-path downsample: conv half + maxpool half (reference block.py:3706)."""

    c2: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c = self.c2 // 2
        x = _avgpool2_s1(x)
        x1, x2 = jnp.split(x, 2, axis=-1)
        x1 = ConvBN(c, 3, 2, p=1, dtype=self.dtype, name="cv1")(x1, train)
        x2 = nn.max_pool(x2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x2 = ConvBN(c, 1, 1, p=0, dtype=self.dtype, name="cv2")(x2, train)
        return jnp.concatenate([x1, x2], axis=-1)


class SPPELAN(nn.Module):
    """SPP-ELAN: 1x1 + three chained k5 maxpools + 1x1 (reference block.py:3726)."""

    c2: int
    c3: int
    k: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        p = self.k // 2
        y = [ConvBN(self.c3, 1, 1, dtype=self.dtype, name="cv1")(x, train)]
        for _ in range(3):
            y.append(nn.max_pool(y[-1], (self.k, self.k), strides=(1, 1), padding=((p, p), (p, p))))
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv5")(jnp.concatenate(y, axis=-1), train)


class ResNetBlock(nn.Module):
    """ResNet bottleneck block (reference block.py:3444)."""

    c2: int
    s: int = 1
    e: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c3 = self.e * self.c2
        c1 = x.shape[-1]
        y = ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBN(self.c2, 3, self.s, p=1, dtype=self.dtype, name="cv2")(y, train)
        y = ConvBN(c3, 1, 1, act=False, dtype=self.dtype, name="cv3")(y, train)
        if self.s != 1 or c1 != c3:
            sc = ConvBN(c3, 1, self.s, act=False, dtype=self.dtype, name="shortcut_0")(x, train)
        else:
            sc = x
        return nn.relu(y + sc)


class ResNetLayer(nn.Module):
    """ResNet stage (reference block.py:3461); used by rtdetr-resnet yamls."""

    c2: int
    s: int = 1
    is_first: bool = False
    n: int = 1
    e: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if self.is_first:
            x = ConvBN(self.c2, 7, 2, p=3, dtype=self.dtype, name="layer_0")(x, train)
            return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = ResNetBlock(self.c2, self.s, self.e, dtype=self.dtype, name="layer_0")(x, train)
        for i in range(1, self.n):
            x = ResNetBlock(self.c2, 1, self.e, dtype=self.dtype, name=f"layer_{i}")(x, train)
        return x


class ConvTranspose2dLayer(nn.Module):
    """Bare torch nn.ConvTranspose2d as a graph layer (yolov6 neck).
    Child named "ct" is dropped in weight-path translation so params map to
    the torch layer directly (model.<i>.weight)."""

    c2: int
    k: int = 2
    s: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        return nn.ConvTranspose(
            self.c2, (self.k, self.k), strides=(self.s, self.s), padding="VALID",
            transpose_kernel=True, kernel_init=TORCH_INIT, dtype=self.dtype, name="ct",
        )(x)


class CBLinear(nn.Module):
    """Cross-branch linear: one conv whose channels are split into per-level
    taps for CBFuse (reference block.py:3746; YOLOv9e dual backbone)."""

    c2s: Tuple[int, ...]
    k: int = 1
    s: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Tuple[Array, ...]:
        pad = autopad(self.k, None, 1)
        y = TConv(
            sum(self.c2s), (self.k, self.k), strides=(self.s, self.s),
            padding=[(pad, pad), (pad, pad)], use_bias=True, dtype=self.dtype, name="conv",
        )(x)
        splits = [sum(self.c2s[: i + 1]) for i in range(len(self.c2s) - 1)]
        return tuple(jnp.split(y, splits, axis=-1))


def cb_fuse(xs, idx):
    """Sum selected CBLinear taps nearest-resized onto the last input
    (reference block.py:3760 CBFuse)."""
    target = xs[-1]
    h, w = target.shape[1], target.shape[2]
    total = target
    for i, x in enumerate(xs[:-1]):
        t = x[idx[i]]
        if t.shape[1] != h or t.shape[2] != w:
            t = jax.image.resize(t.astype(jnp.float32), (t.shape[0], h, w, t.shape[3]), "nearest").astype(t.dtype)
        total = total + t
    return total
