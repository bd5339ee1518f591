"""Multi-host distributed initialization + per-host data sharding.

TPU-native answer to the reference's DDP launcher (reference
engine/trainer.py:217-229 _setup_ddp + utils/dist.py:25-66
generate_ddp_command): instead of re-exec'ing the training script under
``torch.distributed.run`` with one process per GPU, a TPU pod runs ONE
process per host; each process calls :func:`initialize` once, after which
``jax.devices()`` spans the whole slice and a single ``Mesh`` over all global
devices expresses data parallelism. Gradient all-reduce is inserted by XLA
over ICI — there is no process-group plumbing to manage.

Host-side control decisions that the reference broadcasts through Gloo/NCCL
(`dist.broadcast_object_list` of the early-stop flag, trainer.py:399,458-461)
map to :func:`broadcast_scalar`, a one-element psum over the mesh.

Per-host data loading: each host loads only its shard of the global batch
(the analog of ``DistributedSampler``, reference data/build.py:127-145) and
:func:`host_local_batch_to_global` assembles the globally-sharded array from
per-host shards without any cross-host copy of the data itself.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. Call once per host before any computation.

    On Cloud TPU pods the arguments are auto-detected from the metadata
    server; on CPU/GPU clusters (and in tests) pass them explicitly or via
    the standard env vars (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID). Safe to call in single-process mode: a no-op when no
    coordinator is configured.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return  # single-process / auto-detected TPU environment
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    """Rank-0 analog: EMA/validation/checkpointing happen here only."""
    return jax.process_index() == 0


def local_batch_size(global_batch: int) -> int:
    """The slice of the global batch this host must load."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    return global_batch // n


def host_local_batch_to_global(host_batch, mesh: Mesh, axis: str = "data"):
    """Assemble a globally batch-sharded pytree from per-host local shards.

    Each host passes its own ``local_batch_size`` rows; the result behaves as
    one global array of shape (num_hosts * local, ...) sharded over ``axis``.
    No host ever materializes another host's rows (the DistributedSampler
    analog, reference data/build.py:127-145).
    """
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        local_devices = [d for d in mesh.devices.flat if d.process_index == jax.process_index()]
        if not local_devices:
            raise ValueError("mesh contains no devices for this process")
        if x.shape[0] % len(local_devices):
            raise ValueError(
                f"local batch {x.shape[0]} not divisible by {len(local_devices)} local devices"
            )
        per_dev = x.shape[0] // len(local_devices)
        arrays = [
            jax.device_put(x[i * per_dev : (i + 1) * per_dev], d)
            for i, d in enumerate(local_devices)
        ]
        return jax.make_array_from_single_device_arrays(global_shape, sharding, arrays)

    return jax.tree_util.tree_map(put, host_batch)


def broadcast_scalar(value: float, mesh: Mesh, from_main: bool = True) -> float:
    """Agree on a host-side scalar across processes (stop flags, AMP probes).

    The analog of reference ``dist.broadcast_object_list`` (trainer.py:399):
    rank 0's value wins. Implemented as a tiny jitted max-reduce over the
    mesh so it works on any backend without a side channel.
    """
    if jax.process_count() == 1:
        return value
    contrib = np.full((jax.local_device_count(),), value if is_main_process() else -np.inf)
    x = host_local_batch_to_global({"v": contrib}, mesh)["v"]

    @jax.jit
    def reduce(v):
        return jax.numpy.max(v)

    return float(reduce(x))
