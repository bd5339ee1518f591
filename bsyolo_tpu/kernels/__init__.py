"""Pallas TPU kernels for the hot inference path."""

from bsyolo_tpu.kernels.decode import (
    fused_box_best_pallas,
    fused_decode_pallas,
    pallas_supported,
)
from bsyolo_tpu.kernels.postprocess import detect_postprocess

__all__ = [
    "fused_decode_pallas",
    "fused_box_best_pallas",
    "pallas_supported",
    "detect_postprocess",
]
