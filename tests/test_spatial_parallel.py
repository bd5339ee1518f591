"""Spatial (sequence-parallel analog) sharding of the FULL model via GSPMD.

Input images are sharded along H over a "tile" mesh axis in addition to
batch-DP; XLA inserts the convolution halo exchanges and the cross-shard
reductions — no model changes. This is training-side spatial parallelism
the reference has no counterpart for (its only strategy is DDP;
SURVEY.md §2.7), complementing engine/tiled.py's inference tiling.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _build(img_size=64, nc=8):
    from bsyolo_tpu.cfg import model_yaml_path
    from bsyolo_tpu.nn import build_model, load_model_yaml, parse_model_yaml

    d = load_model_yaml(model_yaml_path("yolo11.yaml"))
    d["nc"] = nc
    spec = parse_model_yaml(d, scale="n")
    model, variables = build_model(spec, img_size=img_size)
    return spec, model, variables


class TestSpatialForward:
    def test_h_sharded_forward_matches_single_device(self):
        """Full BS-YOLO forward with images sharded (batch, H) over a
        (data=2, tile=4) mesh matches the unsharded run."""
        spec, model, variables = _build(img_size=128)
        devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devs, ("data", "tile"))
        rep = NamedSharding(mesh, P())
        xs = NamedSharding(mesh, P("data", "tile"))

        x = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (4, 128, 128, 3)).astype(np.float32)
        )
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False),
                      in_shardings=(rep, xs), out_shardings=rep)
        outs = fwd(jax.device_put(variables, rep), jax.device_put(x, xs))
        ref = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
        for a, b in zip(jax.tree_util.tree_leaves(outs), jax.tree_util.tree_leaves(ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # the dp x sp backward compiles ~2 min on the 1-core host
class TestSpatialTrainStep:
    def test_dp_sp_step_matches_dp_loss(self):
        from bsyolo_tpu.engine.optim import OptimConfig
        from bsyolo_tpu.engine.train_step import StepConfig, init_train_state, make_train_step
        from bsyolo_tpu.losses import DetectionLossConfig
        from bsyolo_tpu.parallel.mesh import dp_sp_shardings

        img_size, batch, M = 64, 4, 8
        spec, model, variables = _build(img_size)
        cfg = StepConfig(
            loss=DetectionLossConfig(nc=spec.nc, strides=spec.head_strides),
            optim=OptimConfig(name="SGD", lr0=0.01, epochs=1, nbs=batch),
            batch_size=batch, nb=2, nw=2, use_adamw=False, weight_decay=0.0005,
        )
        step = make_train_step(model, cfg)

        rng = np.random.default_rng(0)
        hb = {
            "img": rng.uniform(0, 1, (batch, img_size, img_size, 3)).astype(np.float32),
            "cls": np.zeros((batch, M), np.int32),
            "bboxes": np.tile(np.asarray([[0.5, 0.5, 0.25, 0.25]], np.float32), (batch, M, 1)),
            "mask": np.pad(np.ones((batch, 1), np.float32), ((0, 0), (0, M - 1))),
        }

        # direct Mesh (no make_mesh): avoid polluting the get_mesh() cache
        mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "tile"))
        img_sh, lbl_sh, rep = dp_sp_shardings(mesh)
        state = jax.device_put(init_train_state(variables), rep)
        b = {k: jax.device_put(v, img_sh if k == "img" else lbl_sh) for k, v in hb.items()}
        s2, m2 = step(state, b)
        loss_sp = float(m2["loss"])

        mesh1 = Mesh(np.asarray(jax.devices()[:2]), ("data",))
        state1 = jax.device_put(init_train_state(variables), NamedSharding(mesh1, P()))
        b1 = {k: jax.device_put(v, NamedSharding(mesh1, P("data"))) for k, v in hb.items()}
        s1, m1 = step(state1, b1)
        loss_dp = float(m1["loss"])

        assert np.isfinite(loss_sp)
        # losses agree (per-param drift after the update is possible: the TAL
        # assigner's hard selections can flip on reduction-order noise)
        assert abs(loss_sp - loss_dp) < 1e-4, (loss_sp, loss_dp)
        # state stays replicated and finite under dp x sp
        for leaf in jax.tree_util.tree_leaves(s2.params):
            assert leaf.sharding.is_fully_replicated
        assert all(np.all(np.isfinite(np.asarray(t)))
                   for t in jax.tree_util.tree_leaves(s2.params))


class TestSamTensorParallel:
    """Megatron-style TP of the SAM ViT encoder via GSPMD param sharding
    (parallel/tp.py) — the scaling lever for the 632M-param ViT-H."""

    def test_tp_encoder_matches_replicated(self):
        from bsyolo_tpu.models.sam.modules import ImageEncoderViT
        from bsyolo_tpu.parallel.tp import apply_tp

        enc = ImageEncoderViT(img_size=64, patch_size=16, embed_dim=64, depth=2,
                              num_heads=8, out_chans=32, window_size=0,
                              global_attn_indexes=(0, 1), pretrain_img_size=64)
        x = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
        )
        variables = enc.init(jax.random.PRNGKey(0), x)
        # give the weights real values (zeros-init attention hides bugs)
        variables = jax.tree_util.tree_map(
            lambda t: jnp.asarray(
                np.random.default_rng(t.size % 9973).normal(0, 0.02, t.shape), t.dtype
            ),
            variables,
        )
        ref = jax.jit(enc.apply)(variables, x)

        # construct the Mesh directly: make_mesh would cache a ("model",)-only
        # mesh in the module-global used by get_mesh(), breaking later tests
        # in the same process that build P("data") shardings off it
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("model",))
        placed, shardings = apply_tp(variables, mesh)
        rep = NamedSharding(mesh, P())
        out = jax.jit(enc.apply, in_shardings=(shardings, rep), out_shardings=rep)(
            placed, jax.device_put(x, rep)
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

        # the attention/MLP weights are actually distributed: each device
        # holds 1/8 of the qkv kernel's contraction dim
        flat = jax.tree_util.tree_leaves_with_path(placed)
        qkv = [v for p, v in flat if any(getattr(k, "key", "") == "qkv" for k in p)
               and v.ndim == 2]
        assert qkv, "no qkv kernels found"
        shard_shape = qkv[0].sharding.shard_shape(qkv[0].shape)
        assert shard_shape[0] == qkv[0].shape[0] // 8
