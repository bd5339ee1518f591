"""Pallas TPU kernels for the hot inference path."""

from bsyolo_tpu.kernels.decode import fused_decode_pallas, pallas_supported

__all__ = ["fused_decode_pallas", "pallas_supported"]
