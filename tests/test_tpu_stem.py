"""The -tpu stem variant (docs/performance.md space-to-depth lever).

yolo11-tpu.yaml swaps the two stride-2 stem convs for a lossless 4x4
pixel-unshuffle + one stride-1 conv so the first contraction fills the MXU
(3x3x48 = 432 lanes vs 27). No reference analog — this is the repo's own
TPU-first design; trained from scratch (parameter shapes diverge from the
reference checkpoint lineage by construction).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

from bsyolo_tpu.nn import build_model, load_model_yaml, parse_model_yaml
from bsyolo_tpu.nn.modules import space_to_depth


class TestSpaceToDepth:
    def test_lossless_and_ordering(self, rng):
        x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 3)).astype(np.float32))
        y = space_to_depth(x, 4)
        assert y.shape == (2, 2, 2, 48)
        # channel order is (dy, dx, c): block pixel (dy,dx) of input patch
        xn = np.asarray(x)
        for dy in range(4):
            for dx in range(4):
                for c in range(3):
                    ch = (dy * 4 + dx) * 3 + c
                    np.testing.assert_array_equal(
                        np.asarray(y)[:, :, :, ch], xn[:, dy::4, dx::4, c]
                    )

    def test_preserves_everything(self, rng):
        x = rng.normal(0, 1, (1, 16, 16, 3)).astype(np.float32)
        y = np.asarray(space_to_depth(jnp.asarray(x), 2))
        assert sorted(y.ravel().tolist()) == sorted(x.ravel().tolist())


class TestTPUStemGraph:
    def test_head_shapes_match_standard_graph(self):
        """Same P3/P4/P5 pyramid (shapes and strides) as yolo11.yaml, so the
        whole loss/decode/NMS stack applies unchanged."""
        outs = {}
        for yml in ("yolo11.yaml", "yolo11-tpu.yaml"):
            d = load_model_yaml(f"bsyolo_tpu/cfg/models/11/{yml}")
            d["nc"] = 8
            spec = parse_model_yaml(d, scale="n")
            model, variables = build_model(spec, img_size=128)
            x = jnp.zeros((1, 128, 128, 3), jnp.float32)
            y = model.apply(variables, x, train=False)
            outs[yml] = (spec, [tuple(t.shape) for t in jax.tree_util.tree_leaves(y)])
        s0, shapes0 = outs["yolo11.yaml"]
        s1, shapes1 = outs["yolo11-tpu.yaml"]
        assert shapes0 == shapes1
        assert s0.head_strides == s1.head_strides == (8, 16, 32)

    def test_scale_inference_from_filename(self):
        d = load_model_yaml("bsyolo_tpu/cfg/models/11/yolo11n-tpu.yaml")
        assert d.get("scale") == "n"

    @pytest.mark.slow
    def test_trains_on_real_images(self, tmp_path):
        """The -tpu stem learns real detection (bsyolo8 overfit smoke), i.e.
        the lossless unshuffle costs no trainability vs the standard stem
        (same bar as test_real_images.TestRealImageTraining)."""
        pytest.importorskip("PIL")
        from bsyolo_tpu.engine.trainer import DetectionTrainer

        if not Path("tests/fixtures/bsyolo8/bsyolo8.yaml").exists():
            pytest.skip("bsyolo8 fixture absent")
        trainer = DetectionTrainer(
            overrides={
                "model": "bsyolo_tpu/cfg/models/11/yolo11n-tpu.yaml",
                "data": "tests/fixtures/bsyolo8/bsyolo8.yaml", "epochs": 200,
                "batch": 8, "imgsz": 192, "optimizer": "SGD", "lr0": 0.03,
                "warmup_epochs": 3.0, "close_mosaic": 150, "project": str(tmp_path),
                "name": "tpu-stem", "max_gt": 16, "amp": False, "patience": 100,
                "nbs": 8,
            }
        )
        metrics = trainer.train()
        m = metrics.results_dict.get("metrics/mAP50(B)", 0.0)
        print(f"\nbsyolo8 -tpu stem mAP50 = {m:.3f}")
        assert m > 0.35, metrics.results_dict

    def test_trains_one_step(self, rng):
        """Gradient flows through the stateless stem (loss finite, stem-conv
        grad nonzero)."""
        from bsyolo_tpu.engine.optim import OptimConfig
        from bsyolo_tpu.engine.train_step import StepConfig, init_train_state, make_train_step
        from bsyolo_tpu.losses import DetectionLossConfig

        d = load_model_yaml("bsyolo_tpu/cfg/models/11/yolo11-tpu.yaml")
        d["nc"] = 8
        spec = parse_model_yaml(d, scale="n")
        model, variables = build_model(spec, img_size=64)
        cfg = StepConfig(
            loss=DetectionLossConfig(nc=spec.nc, strides=spec.head_strides),
            optim=OptimConfig(name="SGD", lr0=0.01, epochs=2, nbs=2),
            batch_size=2, nb=2, nw=0, use_adamw=False, weight_decay=0.0,
        )
        step = make_train_step(model, cfg)
        state = init_train_state(variables)
        M = 8
        batch = {
            "img": jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)),
            "cls": jnp.zeros((2, M), jnp.int32),
            "bboxes": jnp.asarray(
                np.tile(np.array([[0.5, 0.5, 0.4, 0.4]], np.float32), (2, M, 1))
            ),
            "mask": jnp.asarray((np.arange(M)[None] < 1).astype(np.float32).repeat(2, 0)),
        }
        p0 = np.asarray(state.params["m1"]["conv"]["kernel"])
        assert p0.shape[2] == 48  # stem conv consumes the unshuffled 48ch
        state, metrics = step(state, batch)  # ni=0: warmup lr is exactly 0
        state, metrics = step(state, batch)  # ni=1: past nw -> lr=base, params move
        assert np.isfinite(float(metrics["loss"]))
        assert float(np.abs(np.asarray(state.params["m1"]["conv"]["kernel"]) - p0).max()) > 0
