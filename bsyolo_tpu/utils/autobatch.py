"""Automatic batch-size selection (reference utils/autobatch.py).

The reference binary-searches CUDA memory; on TPU the compiler reports exact
per-program memory, so we compile the train step at two batch sizes, fit the
linear memory model, and pick the largest batch under ``fraction`` of HBM —
no trial OOMs.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax

from bsyolo_tpu.utils import LOGGER


def device_memory_bytes(device=None) -> Optional[int]:
    d = device or jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    if stats and "bytes_limit" in stats:
        return int(stats["bytes_limit"])
    # v5e default HBM if the runtime doesn't report it
    return 16 * 1024**3 if d.platform in ("tpu", "axon") else None


def compiled_memory_bytes(fn: Callable, *args) -> Optional[int]:
    """Temp+argument memory of a jitted function from the compiler's analysis."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        m = compiled.memory_analysis()
        if m is None:
            return None
        return int(
            getattr(m, "temp_size_in_bytes", 0)
            + getattr(m, "argument_size_in_bytes", 0)
            + getattr(m, "output_size_in_bytes", 0)
        )
    except Exception as e:  # pragma: no cover
        LOGGER.warning(f"autobatch memory analysis failed: {e}")
        return None


def autobatch(make_args: Callable[[int], tuple], fn: Callable, fraction: float = 0.6,
              max_batch: int = 256) -> int:
    """Pick a batch size filling ``fraction`` of device memory.

    Args:
        make_args: batch_size -> example args for ``fn``.
        fn: the function to be compiled (e.g. a train/predict step).
    """
    total = device_memory_bytes()
    if total is None:
        LOGGER.warning("autobatch: unknown device memory; defaulting to 16")
        return 16
    m1 = compiled_memory_bytes(fn, *make_args(1))
    m2 = compiled_memory_bytes(fn, *make_args(2))
    if not m1 or not m2 or m2 <= m1:
        LOGGER.warning("autobatch: memory model unavailable; defaulting to 16")
        return 16
    per_item = m2 - m1
    base = m1 - per_item
    budget = total * fraction
    batch = int((budget - base) // per_item)
    batch = max(1, min(batch, max_batch))
    # round down to a power of two for friendly tiling
    p = 1
    while p * 2 <= batch:
        p *= 2
    LOGGER.info(
        f"autobatch: base {base/1e9:.2f} GB + {per_item/1e6:.1f} MB/img, "
        f"budget {budget/1e9:.1f} GB -> batch {p}"
    )
    return p
