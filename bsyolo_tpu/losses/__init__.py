"""Losses and target assignment (maps reference utils/{loss,tal}.py)."""

from bsyolo_tpu.losses.tal import task_aligned_assign
from bsyolo_tpu.losses.detect import DetectionLossConfig, detection_loss, init_loss_state

__all__ = ["task_aligned_assign", "DetectionLossConfig", "detection_loss", "init_loss_state"]
