"""SAM family: promptable segmentation (reference models/sam/)."""

from bsyolo_tpu.models.sam.model import SAM

__all__ = ["SAM"]
