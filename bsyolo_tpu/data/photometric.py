"""Photometric augmentation suite + classification transforms.

Covers the reference's Albumentations usage (data/augment.py:1735 — Blur,
MedianBlur, ToGray, CLAHE, RandomBrightnessContrast, RandomGamma,
ImageCompression, each at its reference probability) and the classification
pipelines (classify_transforms eval path :2343, classify_augmentations train
path :2400) as pure numpy/cv2 functions — no external augmentation package,
deterministic under a caller-supplied Generator, and applied host-side so
the device stream stays static-shape.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def blur(img: np.ndarray, k: int = 7) -> np.ndarray:
    import cv2

    k = max(3, int(k) | 1)
    return cv2.blur(img, (k, k))


def median_blur(img: np.ndarray, k: int = 7) -> np.ndarray:
    import cv2

    k = max(3, int(k) | 1)
    return cv2.medianBlur(img, k)


def to_gray(img: np.ndarray) -> np.ndarray:
    import cv2

    g = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    return cv2.cvtColor(g, cv2.COLOR_GRAY2RGB)


def clahe(img: np.ndarray, clip_limit: float = 4.0, tile: int = 8) -> np.ndarray:
    """Contrast-limited adaptive histogram equalization on the L channel."""
    import cv2

    lab = cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
    c = cv2.createCLAHE(clipLimit=clip_limit, tileGridSize=(tile, tile))
    lab[..., 0] = c.apply(lab[..., 0])
    return cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)


def brightness_contrast(
    img: np.ndarray, brightness: float = 0.0, contrast: float = 0.0
) -> np.ndarray:
    """alpha = 1+contrast, beta = 255*brightness (albumentations semantics)."""
    out = img.astype(np.float32) * (1.0 + contrast) + 255.0 * brightness
    return np.clip(out, 0, 255).astype(np.uint8)


def gamma(img: np.ndarray, g: float = 1.0) -> np.ndarray:
    lut = np.clip(((np.arange(256) / 255.0) ** g) * 255.0, 0, 255).astype(np.uint8)
    return lut[img]


def jpeg_compression(img: np.ndarray, quality: int = 75) -> np.ndarray:
    import cv2

    ok, enc = cv2.imencode(".jpg", img[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, int(quality)])
    return cv2.imdecode(enc, cv2.IMREAD_COLOR)[..., ::-1] if ok else img


def photometric_suite(img: np.ndarray, rng: np.random.Generator, p: float = 1.0) -> np.ndarray:
    """Apply the reference Albumentations transform list with its per-op
    probabilities (augment.py:1795-1803: Blur p=.01, MedianBlur p=.01,
    ToGray p=.01, CLAHE p=.01, RandomBrightnessContrast p=.0,
    RandomGamma p=.0, ImageCompression(75-100) p=.0)."""
    if rng.random() >= p:
        return img
    if rng.random() < 0.01:
        img = blur(img, int(rng.integers(3, 8)))
    if rng.random() < 0.01:
        img = median_blur(img, int(rng.integers(3, 8)))
    if rng.random() < 0.01:
        img = to_gray(img)
    if rng.random() < 0.01:
        img = clahe(img)
    return img


# --------------------------------------------------------------------------
# classification transforms (reference classify_transforms /
# classify_augmentations)
# --------------------------------------------------------------------------

DEFAULT_MEAN = (0.0, 0.0, 0.0)
DEFAULT_STD = (1.0, 1.0, 1.0)
DEFAULT_CROP_FRACTION = 1.0


def rand_augment(img: np.ndarray, rng: np.random.Generator, num_ops: int = 2,
                 magnitude: int = 9) -> np.ndarray:
    """RandAugment on uint8 RGB (the numpy/cv2 analog of torchvision
    T.RandAugment, which the reference attaches for auto_augment=randaugment,
    augment.py:2400 classify_augmentations). num_ops=2 / magnitude=9 are the
    torchvision defaults; magnitude is on the standard 31-bin scale."""
    import cv2

    m = magnitude / 31.0
    h, w = img.shape[:2]

    def _affine(mat):
        return cv2.warpAffine(img, mat, (w, h), borderValue=(128, 128, 128))

    def shear_x():
        s = m * 0.3 * (1 if rng.random() < 0.5 else -1)
        return _affine(np.float32([[1, s, 0], [0, 1, 0]]))

    def shear_y():
        s = m * 0.3 * (1 if rng.random() < 0.5 else -1)
        return _affine(np.float32([[1, 0, 0], [s, 1, 0]]))

    def translate_x():
        t = m * 150 / 331 * w * (1 if rng.random() < 0.5 else -1)
        return _affine(np.float32([[1, 0, t], [0, 1, 0]]))

    def translate_y():
        t = m * 150 / 331 * h * (1 if rng.random() < 0.5 else -1)
        return _affine(np.float32([[1, 0, 0], [0, 1, t]]))

    def rotate():
        deg = m * 30 * (1 if rng.random() < 0.5 else -1)
        return _affine(cv2.getRotationMatrix2D((w / 2, h / 2), deg, 1.0))

    def _blend(other, factor):
        return np.clip(
            img.astype(np.float32) * factor + other.astype(np.float32) * (1 - factor), 0, 255
        ).astype(np.uint8)

    def brightness():
        return _blend(np.zeros_like(img), 1 + m * 0.9 * (1 if rng.random() < 0.5 else -1))

    def contrast():
        mean = np.full_like(img, int(img.astype(np.float32).mean()))
        return _blend(mean, 1 + m * 0.9 * (1 if rng.random() < 0.5 else -1))

    def color():
        gray = cv2.cvtColor(cv2.cvtColor(img, cv2.COLOR_RGB2GRAY), cv2.COLOR_GRAY2RGB)
        return _blend(gray, 1 + m * 0.9 * (1 if rng.random() < 0.5 else -1))

    def sharpness():
        blurred = cv2.GaussianBlur(img, (5, 5), 0)
        return _blend(blurred, 1 + m * 0.9 * (1 if rng.random() < 0.5 else -1))

    def posterize():
        bits = max(8 - int(round(m * 4)), 4)
        shift = 8 - bits
        return ((img >> shift) << shift).astype(np.uint8)

    def solarize():
        thr = int(255 * (1 - m))
        return np.where(img >= thr, 255 - img, img).astype(np.uint8)

    def autocontrast():
        out = img.astype(np.float32)
        for c in range(3):
            lo, hi = out[..., c].min(), out[..., c].max()
            if hi > lo:
                out[..., c] = (out[..., c] - lo) * 255.0 / (hi - lo)
        return out.astype(np.uint8)

    def equalize():
        out = img.copy()
        for c in range(3):
            out[..., c] = cv2.equalizeHist(out[..., c])
        return out

    ops = (lambda: img, autocontrast, equalize, rotate, solarize, color, posterize,
           contrast, brightness, sharpness, shear_x, shear_y, translate_x, translate_y)
    for _ in range(num_ops):
        img = ops[int(rng.integers(len(ops)))]()
    return img


def classify_eval_transform(
    img: np.ndarray,
    size: int = 224,
    crop_fraction: float = DEFAULT_CROP_FRACTION,
    mean: Sequence[float] = DEFAULT_MEAN,
    std: Sequence[float] = DEFAULT_STD,
) -> np.ndarray:
    """Eval path: shortest-edge resize -> center crop -> normalize to [0,1]
    with mean/std (reference classify_transforms, augment.py:2343)."""
    import cv2

    scale = int(np.floor(size / crop_fraction))
    h, w = img.shape[:2]
    r = scale / min(h, w)
    img = cv2.resize(img, (max(scale, int(round(w * r))), max(scale, int(round(h * r)))),
                     interpolation=cv2.INTER_LINEAR)
    h, w = img.shape[:2]
    top, left = (h - size) // 2, (w - size) // 2
    img = img[top : top + size, left : left + size]
    out = img.astype(np.float32) / 255.0
    return (out - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def classify_train_transform(
    img: np.ndarray,
    rng: np.random.Generator,
    size: int = 224,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
    hflip: float = 0.5,
    vflip: float = 0.0,
    hsv_h: float = 0.015,
    hsv_s: float = 0.4,
    hsv_v: float = 0.4,
    erasing: float = 0.0,
    auto_augment: Optional[str] = None,
    mean: Sequence[float] = DEFAULT_MEAN,
    std: Sequence[float] = DEFAULT_STD,
) -> np.ndarray:
    """Train path: RandomResizedCrop -> flips -> RandAugment-or-HSV jitter ->
    normalize -> optional random erasing (reference classify_augmentations,
    augment.py:2400). Like the reference, an auto_augment policy DISABLES the
    HSV color jitter; 'autoaugment'/'augmix' fall back to randaugment here
    (no torchvision policy tables offline) with a log note."""
    import cv2

    from bsyolo_tpu.data.augment import random_hsv

    h, w = img.shape[:2]
    area = h * w
    for _ in range(10):
        target = area * rng.uniform(*scale)
        ar = np.exp(rng.uniform(np.log(ratio[0]), np.log(ratio[1])))
        cw = int(round(np.sqrt(target * ar)))
        ch = int(round(np.sqrt(target / ar)))
        if cw <= w and ch <= h:
            x0 = int(rng.integers(0, w - cw + 1))
            y0 = int(rng.integers(0, h - ch + 1))
            img = img[y0 : y0 + ch, x0 : x0 + cw]
            break
    else:  # fallback: center crop of the shortest edge
        m = min(h, w)
        img = img[(h - m) // 2 : (h + m) // 2, (w - m) // 2 : (w + m) // 2]
    img = cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
    if hflip > 0 and rng.random() < hflip:
        img = img[:, ::-1]
    if vflip > 0 and rng.random() < vflip:
        img = img[::-1]
    img = np.ascontiguousarray(img)
    if auto_augment:
        img = rand_augment(img, rng)
    elif hsv_h or hsv_s or hsv_v:
        img = random_hsv(img, rng, hsv_h, hsv_s, hsv_v)
    out = img.astype(np.float32) / 255.0
    out = (out - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    if erasing > 0 and rng.random() < erasing:
        eh = int(size * rng.uniform(0.05, 0.2))
        ew = int(size * rng.uniform(0.05, 0.2))
        y0 = int(rng.integers(0, size - eh))
        x0 = int(rng.integers(0, size - ew))
        out[y0 : y0 + eh, x0 : x0 + ew] = rng.normal(size=(eh, ew, 3)).astype(np.float32)
    return out
