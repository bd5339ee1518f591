"""YOLO-NAS graph blocks, reconstructed from the public super-gradients
architecture description (Deci-AI super-gradients: yolo_nas_*_arch_params,
modules yolo_stages / panneck / dfl_heads; reference models/nas/model.py:56
only loads the pickled torch module and never has a graph definition, so
this file is a structure-level rebuild, not a translation).

Topology (YoloNAS-S):

    stem   QARepVGG 3->48 /2
    stage1 QARepVGG down /2 + CSP(96,  2 blocks, hidden 32)   -> C2 (s4)
    stage2 QARepVGG down /2 + CSP(192, 3 blocks, hidden 64)   -> C3 (s8)
    stage3 QARepVGG down /2 + CSP(384, 5 blocks, hidden 96)   -> C4 (s16)
    stage4 QARepVGG down /2 + CSP(768, 2 blocks, hidden 192)
    SPP(768, k=5/9/13)                                        -> C5 (s32)
    neck   PAN-with-C2: two up-merges (each consuming the two skip levels
           above it) then two down-stages, re-using the up-merges'
           pre-upsample reductions as skips
    head   NDFL: per-level 1x1 stem + (3x3 + 1x1) cls / reg branches,
           DFL with reg_max=16 => 17 bins

All activations are ReLU (the published arch params' activation_type).
Weights: the only published YOLO-NAS weights are pickled super-gradients
torch modules fetched over the network; offline this graph initializes
randomly and trains with the standard detect task machinery.

TPU notes: QARepVGG is built in its train (multi-branch) form — 3x3+BN,
1x1 conv, optional identity, summed under one post-BN + ReLU — which XLA
fuses into two convs + one elementwise epilogue; the deploy-time
re-parameterization (collapse to a single 3x3) is an inference-only
algebraic identity and is intentionally not needed for correctness.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bsyolo_tpu.nn.heads import _bias_const
from bsyolo_tpu.nn.modules import BN_EPS, BN_MOMENTUM, TORCH_INIT, ConvBN

Array = jax.Array


class QARepVGGBlock(nn.Module):
    """Quantization-aware RepVGG block (QARepVGG design S4, arXiv:2212.01593;
    super-gradients modules/qarepvgg_block.py): y = ReLU(BN(conv3x3_bn(x) +
    conv1x1(x) + x)) with the identity branch only when shapes allow."""

    c2: int
    s: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c1 = x.shape[-1]
        y = ConvBN(self.c2, 3, self.s, act=False, dtype=self.dtype, name="branch_3x3")(x, train)
        y = y + nn.Conv(
            self.c2, (1, 1), strides=(self.s, self.s), use_bias=True,
            kernel_init=TORCH_INIT, dtype=self.dtype, name="branch_1x1",
        )(x)
        if c1 == self.c2 and self.s == 1:
            y = y + x
        y = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=self.dtype, name="post_bn",
        )(y)
        return nn.relu(y)


class YoloNASCSPLayer(nn.Module):
    """CSP over QARepVGG bottlenecks (super-gradients YoloNASCSPLayer):
    two 1x1 reduces; n bottlenecks (2x QARepVGG + residual) on the first
    branch; concat (optionally with every intermediate) -> 1x1 out."""

    c2: int
    n: int
    hidden: int
    concat_intermediates: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        h = self.hidden
        a = ConvBN(h, 1, 1, dtype=self.dtype, name="conv1")(x, train)
        b = ConvBN(h, 1, 1, dtype=self.dtype, name="conv2")(x, train)
        outs = [a]
        for i in range(self.n):
            y = QARepVGGBlock(h, 1, dtype=self.dtype, name=f"bottlenecks_{i}_cv1")(outs[-1], train)
            y = QARepVGGBlock(h, 1, dtype=self.dtype, name=f"bottlenecks_{i}_cv2")(y, train)
            outs.append(outs[-1] + y)  # hidden==hidden: always residual
        cat = outs[1:] + [outs[0]] if self.concat_intermediates else [outs[-1]]
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="conv3")(
            jnp.concatenate(cat + [b], axis=-1), train
        )


class YoloNASStem(nn.Module):
    """Stem: one stride-2 QARepVGG (super-gradients YoloNASStem)."""

    c2: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        return QARepVGGBlock(self.c2, 2, dtype=self.dtype, name="conv")(x, train)


class YoloNASStage(nn.Module):
    """Backbone stage: stride-2 QARepVGG downsample + CSP layer
    (super-gradients YoloNASStage)."""

    c2: int
    n: int
    hidden: int
    concat_intermediates: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = QARepVGGBlock(self.c2, 2, dtype=self.dtype, name="downsample")(x, train)
        return YoloNASCSPLayer(
            self.c2, self.n, self.hidden, self.concat_intermediates,
            dtype=self.dtype, name="blocks",
        )(x, train)


class NASUpMerge(nn.Module):
    """Up-merge half of YoloNASUpStage (super-gradients panneck): inputs
    [pre, skip1, skip2] where `pre` is the stage's 1x1 reduction of the
    deeper feature (its own graph layer so the down path can reuse it as
    x_inter, matching the reference neck's two return values). Upsamples
    pre 2x (ConvTranspose k2 s2), 1x1-reduces skip1, 1x1-reduces +
    3x3/s2-downsamples skip2 (two strides shallower), concats the three
    c2-wide maps, 1x1-reduces, then the CSP layer."""

    c2: int
    n: int
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[Array], train: bool = False) -> Array:
        pre, skip1, skip2 = feats
        x = nn.ConvTranspose(
            self.c2, (2, 2), strides=(2, 2), use_bias=True, transpose_kernel=True,
            kernel_init=TORCH_INIT, dtype=self.dtype, name="upsample",
        )(pre)
        s1 = ConvBN(self.c2, 1, 1, dtype=self.dtype, name="reduce_skip1")(skip1, train)
        s2 = ConvBN(self.c2, 1, 1, dtype=self.dtype, name="reduce_skip2")(skip2, train)
        s2 = ConvBN(self.c2, 3, 2, dtype=self.dtype, name="downsample_skip2")(s2, train)
        x = jnp.concatenate([x, s1, s2], axis=-1)
        x = ConvBN(self.c2, 1, 1, dtype=self.dtype, name="reduce_after_concat")(x, train)
        return YoloNASCSPLayer(self.c2, self.n, self.hidden, dtype=self.dtype, name="blocks")(
            x, train
        )


class NASDown(nn.Module):
    """YoloNASDownStage: 3x3/s2 conv to c2/2, concat with the up path's
    x_inter skip, CSP layer to c2."""

    c2: int
    n: int
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[Array], train: bool = False) -> Array:
        x, skip = feats
        x = ConvBN(self.c2 // 2, 3, 2, dtype=self.dtype, name="conv")(x, train)
        x = jnp.concatenate([x, skip], axis=-1)
        return YoloNASCSPLayer(self.c2, self.n, self.hidden, dtype=self.dtype, name="blocks")(
            x, train
        )


class NASDetect(nn.Module):
    """NDFLHeads (super-gradients dfl_heads.py YoloNASDFLHead): per level a
    1x1 stem to `inter` channels, then parallel cls / reg towers (3x3
    ConvBNReLU + 1x1 conv). reg_max=16 in the NAS convention counts bin
    EDGES, so the distribution has 17 bins. Emits the repo-wide Detect map
    layout (B, H, W, 4*bins + nc); the predict/val/export pipeline applies
    unchanged, with every decode site passing spec.reg_max (17 here, 16 for
    the Detect family) explicitly."""

    nc: int
    ch: Tuple[int, ...]
    strides: Tuple[int, ...]
    inter: Tuple[int, ...] = (64, 128, 256)
    reg_max: int = 17  # bins (NAS "reg_max 16" + 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[Array], train: bool = False):
        outs = []
        for i, x in enumerate(feats):
            c = self.inter[i]
            x = ConvBN(c, 1, 1, dtype=self.dtype, name=f"stem_{i}")(x, train)
            cls = ConvBN(c, 3, 1, dtype=self.dtype, name=f"cls_convs_{i}")(x, train)
            # super-gradients dfl_heads prior_prob=1e-2 bias init: an
            # untrained head scores ~0.01 everywhere instead of 0.5
            cls = nn.Conv(
                self.nc, (1, 1), use_bias=True, kernel_init=TORCH_INIT,
                bias_init=_bias_const(-math.log((1 - 1e-2) / 1e-2)),
                dtype=self.dtype, name=f"cls_pred_{i}",
            )(cls)
            reg = ConvBN(c, 3, 1, dtype=self.dtype, name=f"reg_convs_{i}")(x, train)
            reg = nn.Conv(
                4 * self.reg_max, (1, 1), use_bias=True, kernel_init=TORCH_INIT,
                dtype=self.dtype, name=f"reg_pred_{i}",
            )(reg)
            outs.append(jnp.concatenate([reg, cls], axis=-1))
        return outs
