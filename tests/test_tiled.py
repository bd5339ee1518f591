"""Tile-parallel (SAHI-style) inference: train a tiny model, detect on an
image 4x larger than the network input, tiles sharded over the 8-device mesh."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

from test_train_step import TINY, synthetic_batch


@pytest.mark.slow
def test_tiled_detection_across_mesh(rng):
    from bsyolo_tpu.nn import load_model_yaml, parse_model_yaml, build_model
    from bsyolo_tpu.losses import DetectionLossConfig
    from bsyolo_tpu.engine.optim import OptimConfig
    from bsyolo_tpu.engine.train_step import StepConfig, init_train_state, make_train_step
    from bsyolo_tpu.engine.tiled import predict_tiled, tile_grid
    from bsyolo_tpu.parallel import make_mesh

    # quick overfit so detections are real
    d = load_model_yaml(TINY)
    spec = parse_model_yaml(d)
    model, variables = build_model(spec, img_size=64)
    step = make_train_step(
        model,
        StepConfig(
            loss=DetectionLossConfig(nc=spec.nc, strides=spec.head_strides),
            optim=OptimConfig(name="SGD", lr0=0.02, epochs=30, warmup_epochs=0.5, nbs=8),
            batch_size=8, nb=10, nw=5, use_adamw=False, weight_decay=0.0005,
        ),
    )
    state = init_train_state(variables)
    batch = synthetic_batch(rng)
    for _ in range(250):
        state, m = step(state, batch)
    trained = {"params": state.params, "batch_stats": state.batch_stats}

    # big image 128x128 = 2x2 tiles of 64; squares in two different tiles
    big = rng.uniform(0, 0.2, (128, 128, 3)).astype(np.float32)
    big[10:26, 10:26] = 1.0  # tile (0, 0)
    big[90:110, 80:100] = 1.0  # tile (1, 1)
    big_u8 = (big * 255).astype(np.uint8)[..., ::-1]  # to BGR uint8

    assert len(tile_grid(128, 128, 64, overlap=0.0)) == 4
    mesh = make_mesh(4)
    dets = predict_tiled(
        model, spec, trained, big_u8, tile=64, overlap=0.0, conf=0.3, mesh=mesh
    )
    assert len(dets) >= 2, f"expected 2 squares, got {len(dets)}"
    centers = np.stack([(dets[:, 0] + dets[:, 2]) / 2, (dets[:, 1] + dets[:, 3]) / 2], -1)
    d1 = np.min(np.linalg.norm(centers - np.asarray([18, 18]), axis=1))
    d2 = np.min(np.linalg.norm(centers - np.asarray([90, 100]), axis=1))
    assert d1 < 8 and d2 < 8, f"detections not on the squares: {centers}"

    # overlapping tiles: the same object seen by 2+ tiles is fused to one box
    dets_ov = predict_tiled(
        model, spec, trained, big_u8, tile=64, overlap=0.5, conf=0.3
    )
    c = dets_ov[:, :4]
    near1 = ((np.abs((c[:, 0] + c[:, 2]) / 2 - 18) < 8) & (np.abs((c[:, 1] + c[:, 3]) / 2 - 18) < 8)).sum()
    assert near1 == 1, f"cross-tile duplicate not fused: {near1} boxes on square 1"
