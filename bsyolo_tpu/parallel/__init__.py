"""Device mesh + sharding helpers (replaces reference torch.distributed DDP, SURVEY.md §2.7)."""

from bsyolo_tpu.parallel.mesh import (
    batch_sharding,
    dp_sp_shardings,
    get_mesh,
    make_mesh,
    replicated_sharding,
    shard_batch,
    shard_chunk,
)
from bsyolo_tpu.parallel.tp import apply_tp, sam_encoder_tp_shardings

__all__ = [
    "make_mesh", "get_mesh", "batch_sharding", "replicated_sharding", "shard_batch", "shard_chunk",
    "dp_sp_shardings", "apply_tp", "sam_encoder_tp_shardings",
]
