"""Tensor parallelism for the SAM ViT image encoder (GSPMD param sharding).

The reference has no tensor parallelism anywhere (its only strategy is DDP;
SURVEY.md §2.7). It does, however, ship SAM ViT-H — a 632M-parameter
encoder, by far the largest graph in the zoo — and on TPU the natural way to
scale it is Megatron-style sharding expressed as GSPMD annotations:

- attention qkv: kernel (C, 3C) sharded on the output dim -> each device
  computes a head subset
- attention proj: kernel (C, C) sharded on the input dim -> XLA inserts the
  all-reduce of the partial sums
- MLP lin1 (C, 4C) out-sharded / lin2 (4C, C) in-sharded -> one all-reduce
  per block

No model changes: `sam_encoder_tp_shardings` walks the parameter tree and
assigns a NamedSharding per leaf; jit with those in_shardings and XLA
propagates the rest (tests/test_spatial_parallel.py::TestSamTensorParallel
pins numerics vs the replicated run and that the weights are actually
distributed). Per-device parameter memory for the sharded layers drops by
the mesh axis size — the lever that fits ViT-H attention+MLP weights into
small-HBM chips.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bsyolo_tpu.parallel.mesh import get_mesh

# (path-suffix match, leaf name) -> PartitionSpec over the model axis
_RULES = [
    (("qkv",), "kernel", P(None, "model")),
    (("qkv",), "bias", P("model")),
    (("proj",), "kernel", P("model", None)),
    (("proj",), "bias", P()),
    (("mlp", "lin1"), "kernel", P(None, "model")),
    (("mlp", "lin1"), "bias", P("model")),
    (("mlp", "lin2"), "kernel", P("model", None)),
    (("mlp", "lin2"), "bias", P()),
]


def _spec_for(path) -> P:
    *parents, leaf = path
    for suffix, leaf_name, spec in _RULES:
        if leaf == leaf_name and tuple(parents[-len(suffix):]) == suffix:
            return spec
    return P()  # replicate everything else (norms, rel-pos tables, patch embed)


def sam_encoder_tp_shardings(variables, mesh: Optional[Mesh] = None, axis: str = "model"):
    """Pytree of NamedShardings implementing Megatron-style TP for the SAM
    ViT encoder parameter tree. Leaves that don't divide evenly over the
    axis fall back to replication (GSPMD would otherwise pad)."""
    mesh = mesh or get_mesh()
    n = mesh.shape[axis]

    def assign(path, leaf):
        comps = tuple(p.key for p in path)
        spec = _spec_for(comps)
        # rename the generic "model" axis in the rules to the caller's axis
        spec = P(*(axis if s == "model" else s for s in spec))
        for dim, name in enumerate(spec):
            if name is not None and leaf.shape[dim] % n != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, variables)


def apply_tp(variables, mesh: Optional[Mesh] = None, axis: str = "model"):
    """device_put the encoder variables with TP shardings; returns
    (sharded_variables, shardings) — pass the shardings as jit in_shardings."""
    shardings = sam_encoder_tp_shardings(variables, mesh, axis)
    placed = jax.tree_util.tree_map(jax.device_put, variables, shardings)
    return placed, shardings
