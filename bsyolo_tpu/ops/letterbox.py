"""Letterbox resize+pad as a pure op.

Reference: ultralytics/data/augment.py:1477 (LetterBox). Two variants:

- ``letterbox_image``: numpy/cv2 host-side version used by the data pipeline
  and predictor preprocessing — bit-compatible with the reference's cv2
  INTER_LINEAR path (same round-0.1 pad split).
- ``letterbox_jax``: device-side version for fused preprocess graphs
  (jax.image bilinear resize; numerics differ from cv2 at the LSB, so parity
  tests use tolerance).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

try:  # cv2 is an optional host-side dependency
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

import jax
import jax.numpy as jnp


def letterbox_params(
    shape: Tuple[int, int],
    new_shape: Tuple[int, int],
    scaleup: bool = True,
    center: bool = True,
    stride: int = 32,
    auto: bool = False,
    scale_fill: bool = False,
):
    """Compute (ratio, (dw, dh), unpadded_shape) like reference LetterBox.__call__."""
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)
    new_unpad = (int(round(shape[1] * r)), int(round(shape[0] * r)))  # (w, h)
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if auto:
        dw, dh = dw % stride, dh % stride
    if scale_fill:
        dw, dh = 0, 0
        new_unpad = (new_shape[1], new_shape[0])
        r = 1.0  # caller uses width/height ratios separately; not needed here
    if center:
        dw /= 2
        dh /= 2
    return r, (dw, dh), new_unpad


def letterbox_image(
    im: np.ndarray,
    new_shape: Tuple[int, int] = (640, 640),
    color: Tuple[int, int, int] = (114, 114, 114),
    scaleup: bool = True,
    center: bool = True,
    stride: int = 32,
    auto: bool = False,
):
    """Host-side letterbox matching reference augment.py:1477-1560 rounding.

    Returns (image, ratio, (dw, dh)).
    """
    shape = im.shape[:2]
    r, (dw, dh), new_unpad = letterbox_params(shape, new_shape, scaleup, center, stride, auto)
    if shape[::-1] != new_unpad:
        if cv2 is not None:
            im = cv2.resize(im, new_unpad, interpolation=cv2.INTER_LINEAR)
        else:  # PIL fallback
            from PIL import Image

            im = np.asarray(Image.fromarray(im).resize(new_unpad, Image.BILINEAR))
    top, bottom = int(round(dh - 0.1)) if center else 0, int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)) if center else 0, int(round(dw + 0.1))
    if cv2 is not None:
        im = cv2.copyMakeBorder(im, top, bottom, left, right, cv2.BORDER_CONSTANT, value=color)
    else:
        im = np.pad(
            im,
            ((top, bottom), (left, right), (0, 0)),
            mode="constant",
            constant_values=color[0],
        )
    return im, r, (dw, dh)


def letterbox_jax(
    im: jax.Array,
    new_shape: Tuple[int, int] = (640, 640),
    pad_value: float = 114.0,
) -> Tuple[jax.Array, float, Tuple[float, float]]:
    """Device-side letterbox for a single HWC image with *static* input shape.

    Uses bilinear jax.image.resize; intended for fused preprocessing in the
    compiled predict graph where the source resolution is fixed (e.g. video).
    """
    shape = im.shape[:2]
    r, (dw, dh), new_unpad = letterbox_params(shape, new_shape, scaleup=True, center=True)
    resized = jax.image.resize(
        im.astype(jnp.float32), (new_unpad[1], new_unpad[0], im.shape[2]), method="bilinear"
    )
    top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
    bottom = new_shape[0] - new_unpad[1] - top
    right = new_shape[1] - new_unpad[0] - left
    out = jnp.pad(
        resized,
        ((top, bottom), (left, right), (0, 0)),
        mode="constant",
        constant_values=pad_value,
    )
    return out, r, (dw, dh)
