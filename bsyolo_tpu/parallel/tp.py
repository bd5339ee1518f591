"""Tensor parallelism for the SAM ViT image encoder (GSPMD param sharding).

The reference has no tensor parallelism anywhere (its only strategy is DDP;
SURVEY.md §2.7). It does, however, ship SAM ViT-H — a 632M-parameter
encoder, by far the largest graph in the zoo — and on TPU the natural way to
scale it is GSPMD parameter sharding. This module shards every attention and
MLP weight on its CONTRACTION dimension (row-parallel):

- qkv (C, 3C) and MLP lin1 (C, 4C): kernel sharded on the input dim — each
  device multiplies its slice of the contraction and XLA all-reduces the
  partial sums
- proj (C, C) and lin2 (4C, C): likewise in-dim sharded

Contraction sharding distributes BOTH the weight memory (each device holds
1/axis of every sharded kernel — the lever that fits ViT-H's attention+MLP
weights into small-HBM chips) and the matmul FLOPs. What it does NOT split
is the attention-score/softmax stage itself: the checkpoint's fused qkv
layout orders the output dim as (3, heads, head_dim), and a contiguous
GSPMD shard of 3C cannot express a per-head split (classic Megatron
column-parallel needs unfused or head-major weights — checkpoint surgery
this framework deliberately avoids to keep torch->flax conversion exact).

No model changes: `sam_encoder_tp_shardings` walks the parameter tree and
assigns a NamedSharding per leaf; jit with those in_shardings and XLA
propagates the rest (tests/test_spatial_parallel.py::TestSamTensorParallel
pins numerics vs the replicated run and that the weights are actually
distributed).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bsyolo_tpu.parallel.mesh import get_mesh

# (path-suffix match, leaf name) -> PartitionSpec over the model axis.
# All kernels shard the contraction (input) dim; biases stay replicated
# (they add to the post-all-reduce full activation).
_RULES = [
    (("qkv",), "kernel", P("model", None)),
    (("proj",), "kernel", P("model", None)),
    (("mlp", "lin1"), "kernel", P("model", None)),
    (("mlp", "lin2"), "kernel", P("model", None)),
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
