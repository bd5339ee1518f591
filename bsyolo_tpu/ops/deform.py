"""Deformable convolution v3/v4 core (TPU-native equivalents of reference N1/N2).

Reference: ultralytics/nn/ops_dcnv3/ (CUDA im2col gather kernels,
dcnv3_im2col_cuda.cuh) with the pure-torch fallback dcnv3_core_pytorch
(functions/dcnv3_func.py:147-188) as the numerics spec, and
ultralytics/nn/DCNv4_op/ whose DCNv4 differs by not softmaxing the
modulation mask.

TPU strategy: irregular gathers are TPU-hostile, so the sampling is expressed
as dense bilinear interpolation (gather on flattened indices + 4-tap blend),
which XLA lowers to vectorized dynamic-gathers. This is the
"XLA gather composition" baseline from SURVEY.md §2.9; a Pallas kernel with
manual VMEM staging is the optimization path.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def _bilinear_gather(img: Array, x: Array, y: Array) -> Array:
    """Sample img (H, W, C) at pixel coords x, y (...,) with zero padding.

    grid_sample(align_corners=False) semantics: integer centers at 0..H-1,
    out-of-bounds contributes zero.
    """
    H, W, C = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0)[..., None]
    dy = (y - y0)[..., None]

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = img.reshape(H * W, C)
        v = flat[yi_c * W + xi_c]  # (..., C)
        return v * inb[..., None]

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    return (
        v00 * (1 - dx) * (1 - dy)
        + v01 * dx * (1 - dy)
        + v10 * (1 - dx) * dy
        + v11 * dx * dy
    )


@partial(
    jax.jit,
    static_argnames=(
        "kernel_h",
        "kernel_w",
        "stride_h",
        "stride_w",
        "pad_h",
        "pad_w",
        "dilation_h",
        "dilation_w",
        "group",
        "group_channels",
        "offset_scale",
        "softmax_mask",
    ),
)
def dcnv3_core(
    x: Array,  # (N, H, W, G*Gc) NHWC
    offset: Array,  # (N, Hout, Wout, G*P*2) in (x, y) pairs
    mask: Array,  # (N, Hout, Wout, G*P) modulation logits/weights
    kernel_h: int = 3,
    kernel_w: int = 3,
    stride_h: int = 1,
    stride_w: int = 1,
    pad_h: int = 1,
    pad_w: int = 1,
    dilation_h: int = 1,
    dilation_w: int = 1,
    group: int = 1,
    group_channels: int = 16,
    offset_scale: float = 1.0,
    softmax_mask: bool = False,
) -> Array:
    """Deformable sampling core matching dcnv3_core_pytorch numerics.

    With softmax_mask=True the modulation is softmaxed over the P taps per
    group (the DCNv4 module leaves it raw — reference DCNv4_op).
    """
    x = jnp.pad(x, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)))
    N, H_in, W_in, _ = x.shape
    _, H_out, W_out, _ = offset.shape
    G, Gc, P = group, group_channels, kernel_h * kernel_w

    # reference points in normalized coords (dcnv3_func.py:91-119)
    ry0 = (dilation_h * (kernel_h - 1)) // 2 + 0.5
    rx0 = (dilation_w * (kernel_w - 1)) // 2 + 0.5
    ref_y = (ry0 + jnp.arange(H_out, dtype=jnp.float32) * stride_h) / H_in
    ref_x = (rx0 + jnp.arange(W_out, dtype=jnp.float32) * stride_w) / W_in
    ref = jnp.stack(jnp.meshgrid(ref_x, ref_y, indexing="xy"), -1)  # (H_out, W_out, 2)

    # dilation grid (dcnv3_func.py:122-144); torch meshgrid without indexing
    # uses 'ij', so grid_x varies along the first (kernel_w) axis
    gx = -((dilation_w * (kernel_w - 1)) // 2) + jnp.arange(kernel_w, dtype=jnp.float32) * dilation_w
    gy = -((dilation_h * (kernel_h - 1)) // 2) + jnp.arange(kernel_h, dtype=jnp.float32) * dilation_h
    grid = jnp.stack(
        [jnp.repeat(gx, kernel_h) / W_in, jnp.tile(gy, kernel_w) / H_in], axis=-1
    )  # (P, 2) — (x, y), kernel_w-major like torch meshgrid('ij') flatten

    spatial_norm = jnp.asarray([W_in, H_in], jnp.float32)
    off = offset.reshape(N, H_out, W_out, G, P, 2).astype(jnp.float32)
    loc = (
        ref[None, :, :, None, None, :]
        + grid[None, None, None, None, :, :] * offset_scale
        + off * offset_scale / spatial_norm
    )  # normalized (N, H_out, W_out, G, P, 2)

    # to pixel coords under align_corners=False: px = loc * size - 0.5
    px = loc[..., 0] * W_in - 0.5
    py = loc[..., 1] * H_in - 0.5

    m = mask.reshape(N, H_out, W_out, G, P).astype(jnp.float32)
    if softmax_mask:
        m = jax.nn.softmax(m, axis=-1)

    xg = x.reshape(N, H_in, W_in, G, Gc)

    def per_image(img_g, px_i, py_i, m_i):
        # img_g: (H, W, G, Gc); px_i/py_i/m_i: (H_out, W_out, G, P); G at axis 2
        def per_group(img, gx_, gy_, gm):
            s = _bilinear_gather(img, gx_, gy_)  # (H_out, W_out, P, Gc)
            return jnp.sum(s * gm[..., None], axis=-2)  # (H_out, W_out, Gc)

        return jax.vmap(per_group, in_axes=(2, 2, 2, 2), out_axes=2)(img_g, px_i, py_i, m_i)

    out = jax.vmap(per_image)(xg, px, py, m)  # (N, H_out, W_out, G, Gc)
    return out.reshape(N, H_out, W_out, G * Gc)


class DCNv3(nn.Module):
    """DCNv3 module (reference ops_dcnv3/modules/dcnv3.py:95 DCNv3_pytorch).

    depthwise conv -> offset/mask projections; input/output 1x1 projections.
    """

    channels: int
    kernel_size: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    group: int = 4
    offset_scale: float = 1.0
    dcn_version: int = 3  # 4 = raw (unsoftmaxed) mask like DCNv4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        C, G = self.channels, self.group
        Gc = C // G
        P = self.kernel_size * self.kernel_size
        x_proj = nn.Dense(C, dtype=self.dtype, name="input_proj")(x)

        # offset/mask trunk: depthwise conv + LN + GELU (reference dw_conv)
        t = nn.Conv(
            C,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(self.pad, self.pad)] * 2,
            feature_group_count=C,
            dtype=self.dtype,
            name="dw_conv",
        )(x)
        t = nn.LayerNorm(dtype=self.dtype, name="dw_norm")(t)
        t = nn.gelu(t)
        offset = nn.Dense(G * P * 2, dtype=self.dtype, name="offset")(t)
        mask_logits = nn.Dense(G * P, dtype=self.dtype, name="mask")(t)

        y = dcnv3_core(
            x_proj,
            offset,
            mask_logits,
            kernel_h=self.kernel_size,
            kernel_w=self.kernel_size,
            stride_h=self.stride,
            stride_w=self.stride,
            pad_h=self.pad,
            pad_w=self.pad,
            dilation_h=self.dilation,
            dilation_w=self.dilation,
            group=G,
            group_channels=Gc,
            offset_scale=self.offset_scale,
            softmax_mask=self.dcn_version == 3,
        )
        return nn.Dense(C, dtype=self.dtype, name="output_proj")(y)
