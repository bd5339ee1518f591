"""RT-DETR DETR loss under batch sharding (VERDICT r2 #8).

The Hungarian matcher runs as a jax.pure_callback inside the jitted train
step; with the batch sharded over the 8-device mesh the callback invocation
semantics (full-value vs per-shard, ordering) are the riskiest untested
interaction. These tests pin them: the sharded step must produce the SAME
loss and gradients as the unsharded one on identical inputs.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

from test_rtdetr import _tiny_spec


def _make_step(spec, model):
    from bsyolo_tpu.engine.optim import OptimConfig
    from bsyolo_tpu.engine.train_step import StepConfig, init_train_state, make_train_step
    from bsyolo_tpu.losses import DetectionLossConfig
    from bsyolo_tpu.losses.detr import rtdetr_loss

    B = 8
    cfg = StepConfig(
        loss=DetectionLossConfig(nc=4, strides=spec.head_strides),
        optim=OptimConfig(name="SGD", lr0=1e-2, epochs=1, nbs=B),
        batch_size=B, nb=1, nw=0, use_adamw=False, weight_decay=0.0,
        pass_targets=True,
    )

    def criterion(outputs, batch, ls, lc):
        total, items = rtdetr_loss(outputs, batch["cls"], batch["bboxes"], batch["mask"])
        return total, items, ls

    step = make_train_step(model, cfg, criterion=criterion,
                           item_names=("cls_loss", "bbox_loss", "giou_loss"))
    return step, init_train_state


def _batch(rng, B=8, M=6):
    # per-image distinct gt counts/boxes so a shard-order bug actually shows
    n_valid = (np.arange(B) % (M - 1)) + 1
    mask = (np.arange(M)[None] < n_valid[:, None]).astype(np.float32)
    boxes = rng.uniform(0.2, 0.8, (B, M, 2))
    wh = rng.uniform(0.05, 0.3, (B, M, 2))
    return {
        "img": rng.uniform(0, 1, (B, 64, 64, 3)).astype(np.float32),
        "cls": rng.integers(0, 4, (B, M)).astype(np.int32),
        "bboxes": np.concatenate([boxes, wh], -1).astype(np.float32),
        "mask": mask,
    }


class TestShardedDETRLoss:
    def test_sharded_matches_single_device(self, rng):
        """Loss + gradients identical (tolerance: compiler reassociation)
        between the unsharded jit and the 8-device batch-sharded jit."""
        from bsyolo_tpu.nn import build_model
        from bsyolo_tpu.parallel import make_mesh, replicated_sharding, shard_batch

        spec = _tiny_spec()
        model, variables = build_model(spec, img_size=64)
        step, init_train_state = _make_step(spec, model)
        batch = _batch(rng)

        # single-device reference
        state0 = init_train_state(variables)
        s1, m1 = step(state0, {k: jnp.asarray(v) for k, v in batch.items()})

        # sharded run: replicated params, batch split over the data axis
        mesh = make_mesh(8)
        state0b = init_train_state(variables)
        state0b = jax.device_put(state0b, replicated_sharding(mesh))
        sharded = shard_batch(batch, mesh)
        s2, m2 = step(state0b, sharded)

        assert np.isfinite(float(m1["loss"]))
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-5)
        for k in ("cls_loss", "bbox_loss", "giou_loss"):
            np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-3, atol=1e-6)

        # the effective parameter updates (lr x clipped grads) must agree as
        # a vector; per-leaf max-relative is the wrong metric (tiny-magnitude
        # leaves amplify f32 reduction-order noise). Diagnosed 2026-08-17:
        # global L2 rel diff of raw grads sharded-vs-single is ~3e-4 — pure
        # reassociation, no semantic divergence.
        def upd(s, s0):
            return jnp.concatenate(
                [
                    (a - b).reshape(-1)
                    for a, b in zip(
                        jax.tree_util.tree_leaves(s.params), jax.tree_util.tree_leaves(s0)
                    )
                ]
            )

        u1 = upd(s1, variables["params"])
        u2 = upd(s2, variables["params"])
        rel = float(jnp.linalg.norm(u1 - u2) / (jnp.linalg.norm(u1) + 1e-12))
        assert rel < 2e-3, f"sharded update diverges from single-device: {rel}"

    def test_hungarian_callback_batch_order_under_sharding(self, rng):
        """The matcher's host callback must see rows in logical batch order:
        per-image assignments from the sharded call equal the unsharded ones."""
        from bsyolo_tpu.losses.detr import hungarian_match
        from bsyolo_tpu.parallel import batch_sharding, make_mesh

        B, nq, nc, M = 8, 16, 4, 5
        pb = rng.uniform(0.1, 0.9, (B, nq, 4)).astype(np.float32)
        ps = rng.normal(size=(B, nq, nc)).astype(np.float32)
        gc = rng.integers(0, nc, (B, M)).astype(np.int32)
        gb = rng.uniform(0.2, 0.8, (B, M, 4)).astype(np.float32)
        gm = (np.arange(M)[None] < ((np.arange(B) % M) + 1)[:, None]).astype(np.float32)

        ref = np.asarray(jax.jit(hungarian_match)(pb, ps, gc, gb, gm))

        mesh = make_mesh(8)
        sh = batch_sharding(mesh)
        args = [jax.device_put(jnp.asarray(x), sh) for x in (pb, ps, gc, gb, gm)]
        got = np.asarray(jax.jit(hungarian_match)(*args))
        np.testing.assert_array_equal(ref, got)
