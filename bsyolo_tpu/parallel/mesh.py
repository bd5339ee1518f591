"""Device mesh and sharding utilities.

TPU-native replacement for the reference's DDP machinery (reference
engine/trainer.py:217-229 _setup_ddp, utils/dist.py:25-66 subprocess
relaunch): one process per host, a ``jax.sharding.Mesh`` over all chips, data
parallelism expressed as batch-axis sharding, gradient all-reduce inserted by
XLA over ICI. No process-group plumbing, no generated launch scripts.

Axes:
- "data": batch sharding (DP). The only axis the reference supports.
- "tile": spatial tile parallelism for SAHI-style large-image inference
  (the sequence-parallel analog the reference lacks; SURVEY.md §5.7).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_MESH: Optional[Mesh] = None


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Create (and cache) a 1D/2D device mesh over available devices."""
    global _MESH
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    if len(axis_names) == 1:
        arr = np.asarray(devs)
    else:
        # fold devices into a (data, tile) grid, tile-major innermost
        n = len(devs)
        tile = 1
        for t in range(int(np.sqrt(n)), 0, -1):
            if n % t == 0:
                tile = t
                break
        arr = np.asarray(devs).reshape(n // tile, tile)
    _MESH = Mesh(arr, axis_names=tuple(axis_names))
    return _MESH


def get_mesh() -> Mesh:
    global _MESH
    if _MESH is None:
        _MESH = make_mesh()
    return _MESH


def batch_sharding(mesh: Optional[Mesh] = None, axis: str = "data") -> NamedSharding:
    """Shard leading (batch) dimension across the data axis."""
    mesh = mesh or get_mesh()
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Optional[Mesh] = None) -> NamedSharding:
    mesh = mesh or get_mesh()
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Optional[Mesh] = None):
    """Device-put a pytree of host arrays with batch-dim sharding."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def shard_chunk(batches, mesh: Optional[Mesh] = None):
    """Device-put a stacked (K, B, ...) pytree: step axis replicated, batch
    axis sharded over "data". One transfer stages K training steps' inputs
    (see train_step.make_chunked_train_step)."""
    mesh = mesh or get_mesh()
    sh = NamedSharding(mesh, P(None, "data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batches)


def dp_sp_shardings(mesh: Optional[Mesh] = None):
    """Shardings for a data x spatial (sequence-parallel analog) train step.

    Images shard over ("data", "tile") on (batch, H); labels shard over
    "data" only. GSPMD inserts the convolution halo exchanges along the
    sharded H axis and the cross-shard reductions the loss needs — the whole
    BS-YOLO train step runs unchanged (tests/test_spatial_parallel.py pins
    loss parity vs plain DP). Use when a single image's activations are the
    memory bottleneck (large-imgsz training), the training-side counterpart
    of engine/tiled.py inference.

    Returns (image_sharding, label_sharding, replicated).
    """
    mesh = mesh or get_mesh()
    assert "tile" in mesh.axis_names and "data" in mesh.axis_names, (
        'dp_sp_shardings needs a 2D mesh: make_mesh(n, axis_names=("data", "tile"))'
    )
    return (
        NamedSharding(mesh, P("data", "tile")),
        NamedSharding(mesh, P("data")),
        NamedSharding(mesh, P()),
    )
