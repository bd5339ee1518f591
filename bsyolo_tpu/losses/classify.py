"""Classification loss (reference utils/loss.py:724 v8ClassificationLoss)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from bsyolo_tpu.losses.detect import LossState

Array = jax.Array


def classification_loss(logits: Array, labels: Array, state: LossState, cfg=None) -> Tuple[Array, Array, LossState]:
    """Cross-entropy; returns (total, items[1], state) like the task losses."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, labels.astype(jnp.int32)[:, None], axis=-1)[:, 0]
    loss = jnp.mean(ce)
    return loss, jnp.stack([loss]), state
