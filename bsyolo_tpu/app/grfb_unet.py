"""GRFB-UNet tactile-paving segmentation network in flax (NHWC).

Reference: sys/src/GRFBUNet.py — a UNet whose Down blocks append a GRFB
(group receptive field block) module: three dilated-conv branches
(dilations visual/2*visual/3*visual) + shortcut, fused at scale 0.1.
The application uses in_channels=3, num_classes=2, base_c=32
(sys/videobytetrack.py:220-223).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class BasicConv(nn.Module):
    """conv + BN + optional ReLU (reference GRFBUNet.py BasicConv)."""

    c2: int
    k: Tuple[int, int] = (1, 1)
    s: int = 1
    p: Tuple[int, int] = (0, 0)
    d: int = 1
    g: int = 1
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nn.Conv(
            self.c2,
            self.k,
            strides=(self.s, self.s),
            padding=[(self.p[0], self.p[0]), (self.p[1], self.p[1])],
            kernel_dilation=(self.d, self.d),
            feature_group_count=self.g,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-5, dtype=self.dtype, name="bn"
        )(x)
        return nn.relu(x) if self.relu else x


class GRFB(nn.Module):
    """Group receptive field block (reference GRFBUNet.py:95-143)."""

    c2: int
    scale: float = 0.1
    visual: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c1 = x.shape[-1]
        ip = c1 // 8  # inter_planes
        v = self.visual
        k3 = (3, 3)

        b0 = BasicConv(2 * ip, dtype=self.dtype, name="b0_0")(x, train)
        b0 = BasicConv(2 * ip, k3, p=(v, v), d=v, relu=False, dtype=self.dtype, name="b0_1")(b0, train)
        b0 = BasicConv(2 * ip, dtype=self.dtype, name="b0_2")(b0, train)

        b1 = BasicConv(ip, dtype=self.dtype, name="b1_0")(x, train)
        b1 = BasicConv(2 * ip, k3, p=(1, 1), g=ip, dtype=self.dtype, name="b1_1")(b1, train)
        b1 = BasicConv(2 * ip, dtype=self.dtype, name="b1_2")(b1, train)
        b1 = BasicConv(2 * ip, k3, p=(2 * v, 2 * v), d=2 * v, relu=False, dtype=self.dtype, name="b1_3")(b1, train)
        b1 = BasicConv(2 * ip, dtype=self.dtype, name="b1_4")(b1, train)

        b2 = BasicConv(ip, dtype=self.dtype, name="b2_0")(x, train)
        b2 = BasicConv(2 * ip, k3, p=(1, 1), g=ip, dtype=self.dtype, name="b2_1")(b2, train)
        b2 = BasicConv(2 * ip, dtype=self.dtype, name="b2_2")(b2, train)
        b2 = BasicConv(2 * ip, k3, p=(1, 1), g=2 * ip, dtype=self.dtype, name="b2_3")(b2, train)
        b2 = BasicConv(2 * ip, dtype=self.dtype, name="b2_4")(b2, train)
        b2 = BasicConv(2 * ip, k3, p=(3 * v, 3 * v), d=3 * v, relu=False, dtype=self.dtype, name="b2_5")(b2, train)
        b2 = BasicConv(2 * ip, dtype=self.dtype, name="b2_6")(b2, train)

        out = jnp.concatenate([x, b0, b1, b2], axis=-1)  # 8ip + 3*2ip = 14ip
        out = BasicConv(self.c2, relu=False, dtype=self.dtype, name="linear")(out, train)
        short = BasicConv(self.c2, relu=False, dtype=self.dtype, name="shortcut")(x, train)
        return nn.relu(out * self.scale + short)


class DoubleConv(nn.Module):
    c2: int
    mid: int = 0
    with_grfb: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        mid = self.mid or self.c2

        def cbr(t, c, name):
            t = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype, name=f"{name}_conv")(t)
            t = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name=f"{name}_bn"
            )(t)
            return nn.relu(t)

        x = cbr(x, mid, "c0")
        x = cbr(x, self.c2, "c1")
        if self.with_grfb:
            x = GRFB(self.c2, dtype=self.dtype, name="grfb")(x, train)
        return x


class GRFBUNet(nn.Module):
    """UNet with GRFB-augmented encoder (reference GRFBUNet.py:145-176)."""

    num_classes: int = 2
    base_c: int = 32
    bilinear: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c = self.base_c
        factor = 2 if self.bilinear else 1

        def down(t, ch, name):
            t = nn.max_pool(t, (2, 2), strides=(2, 2))
            return DoubleConv(ch, with_grfb=True, dtype=self.dtype, name=name)(t, train)

        def up(t, skip, ch, name):
            B, H, W, C = t.shape
            t = jax.image.resize(t, (B, H * 2, W * 2, C), method="bilinear")
            dh = skip.shape[1] - t.shape[1]
            dw = skip.shape[2] - t.shape[2]
            t = jnp.pad(t, ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)))
            t = jnp.concatenate([skip, t], axis=-1)
            return DoubleConv(ch, mid=t.shape[-1] // 2 if self.bilinear else 0, dtype=self.dtype, name=name)(
                t, train
            )

        x1 = DoubleConv(c, dtype=self.dtype, name="in_conv")(x, train)
        x2 = down(x1, c * 2, "down1")
        x3 = down(x2, c * 4, "down2")
        x4 = down(x3, c * 8, "down3")
        x5 = down(x4, c * 16 // factor, "down4")
        y = up(x5, x4, c * 8 // factor, "up1")
        y = up(y, x3, c * 4 // factor, "up2")
        y = up(y, x2, c * 2 // factor, "up3")
        y = up(y, x1, c, "up4")
        return nn.Conv(self.num_classes, (1, 1), use_bias=True, dtype=self.dtype, name="out_conv")(y)


# normalization constants from the reference app (sys/videobytetrack.py:102-103)
BLINDWAY_MEAN = (0.709, 0.381, 0.224)
BLINDWAY_STD = (0.127, 0.079, 0.043)


class BlindwaySegmenter:
    """Jitted segmentation wrapper matching reference segment_image
    (sys/videobytetrack.py:169-203): short-side resize to 565, normalize,
    argmax -> {0, 255} mask resized back to the frame."""

    def __init__(self, variables=None, num_classes: int = 2, base_c: int = 32, resize: int = 565, seed: int = 0):
        self.model = GRFBUNet(num_classes=num_classes, base_c=base_c)
        self.resize = resize
        if variables is None:
            variables = jax.jit(lambda k, x: self.model.init(k, x, train=False))(
                jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3), jnp.float32)
            )
        self.variables = variables
        self._jit_cache = {}

    def _forward(self, shape):
        if shape not in self._jit_cache:
            model = self.model

            def fn(variables, x):
                logits = model.apply(variables, x, train=False)
                return jnp.argmax(logits, axis=-1)

            self._jit_cache[shape] = jax.jit(fn)
        return self._jit_cache[shape]

    def __call__(self, frame_bgr) -> "np.ndarray":
        """frame (H, W, 3) BGR uint8 -> mask (H, W) uint8 in {0, 255}."""
        import cv2
        import numpy as np

        h, w = frame_bgr.shape[:2]
        r = self.resize / min(h, w)
        # multiples of 16 keep the UNet pool/up path shape-stable
        nh, nw = (int(round(h * r / 16)) * 16, int(round(w * r / 16)) * 16)
        img = cv2.resize(frame_bgr, (nw, nh), interpolation=cv2.INTER_LINEAR)
        rgb = img[..., ::-1].astype(np.float32) / 255.0
        rgb = (rgb - np.asarray(BLINDWAY_MEAN)) / np.asarray(BLINDWAY_STD)
        pred = self._forward((nh, nw))(self.variables, jnp.asarray(rgb[None], jnp.float32))
        mask = np.asarray(pred[0]).astype(np.uint8)
        mask = cv2.resize(mask, (w, h), interpolation=cv2.INTER_LINEAR)
        return (mask > 0).astype(np.uint8) * 255
