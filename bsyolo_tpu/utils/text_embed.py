"""Deterministic offline text embeddings for the open-vocab (World) path.

The reference computes class-text embeddings with CLIP ViT-B/32
(reference models/yolo/world/train.py); CLIP is not available in this
offline image. This module provides a clearly-labeled NON-CLIP stand-in:
hashed character n-gram vectors. They are deterministic, dependency-free,
and lexically smooth (similar strings -> similar vectors), which is enough
to drive the full C2fAttn/ImagePoolingAttn/contrastive-head machinery end
to end — but they carry no visual-semantic alignment, so detection quality
with an untrained/converted model is NOT meaningful. For real open-vocab
quality, pass CLIP embeddings via ``set_classes(..., embeddings=...)``.
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence

import numpy as np


def hashed_text_embeddings(names: Sequence[str], dim: int = 512, seed: int = 0) -> np.ndarray:
    """(K,) class-name strings -> (K, dim) L2-normalized float32 vectors.

    Feature-hashed character n-grams (n = 2, 3, 4) over the lowercased,
    boundary-marked name; each n-gram contributes +/-1 at a blake2b-derived
    index. Same name (and seed) always yields the same vector.
    """
    out = np.zeros((len(names), dim), np.float32)
    key = str(seed).encode()
    for i, name in enumerate(names):
        t = f"<{str(name).lower().strip()}>"
        for n in (2, 3, 4):
            for j in range(max(len(t) - n + 1, 0)):
                h = int.from_bytes(
                    hashlib.blake2b(t[j : j + n].encode(), digest_size=8, key=key).digest(),
                    "little",
                )
                sign = 1.0 if (h >> 63) & 1 else -1.0
                out[i, h % dim] += sign
    norm = np.linalg.norm(out, axis=-1, keepdims=True)
    return out / np.maximum(norm, 1e-12)
