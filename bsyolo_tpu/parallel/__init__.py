"""Device mesh + sharding helpers (replaces reference torch.distributed DDP, SURVEY.md §2.7)."""

from bsyolo_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    make_mesh,
    replicated_sharding,
    shard_batch,
)

__all__ = ["make_mesh", "get_mesh", "batch_sharding", "replicated_sharding", "shard_batch"]
