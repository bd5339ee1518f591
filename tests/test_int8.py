"""Int8 inference path (docs/performance.md lever; VERDICT r2 #3a).

ConvBN's conv runs as int8 x int8 -> int32 with per-out-channel weight
scales from the live f32/bf16 params (no separate checkpoint) and either
dynamic (in-graph per-tensor abs-max) or static (nn/quant.calibrate_int8
max-calibration; scale is a trace constant XLA can fuse away) activation
scales. These tests pin
(1) engagement: the lowered model really contains int8 convs,
(2) numerics: per-layer quantization error is bounded in both modes,
(3) calibration: harvested scale keys match apply-time module paths,
(4) accuracy: a trained tiny model keeps its mAP under int8 (slow tier).

NOTE every test jits a FRESH function after flipping the mode — the switch
is trace-time; jax.jit caches per function object (see set_int8_inference).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

from bsyolo_tpu.nn import modules as M


@pytest.fixture(autouse=True)
def _reset_flag():
    yield
    M.set_int8_inference(False)


class TestConvBNInt8:
    def test_layer_error_bounded(self, rng):
        x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 32)).astype(np.float32))
        m = M.ConvBN(64, 3, 1)
        v = m.init(jax.random.PRNGKey(0), x)
        y0 = m.apply(v, x, train=False)
        M.set_int8_inference(True)
        y1 = m.apply(v, x, train=False)
        rel = float(jnp.max(jnp.abs(y0 - y1)) / (jnp.max(jnp.abs(y0)) + 1e-9))
        assert 1e-5 < rel < 0.03, rel  # quantized (not a no-op) but bounded

    def test_depthwise_stays_float(self, rng):
        """Grouped convs keep the float path (VPU-bound; int8 wins nothing)."""
        x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 32)).astype(np.float32))
        m = M.ConvBN(32, 3, 1, g=32)
        v = m.init(jax.random.PRNGKey(0), x)
        y0 = m.apply(v, x, train=False)
        M.set_int8_inference(True)
        y1 = m.apply(v, x, train=False)
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    def test_train_path_unquantized(self, rng):
        """train=True never quantizes (no straight-through estimator here)."""
        x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 16)).astype(np.float32))
        m = M.ConvBN(16, 3, 1)
        v = m.init(jax.random.PRNGKey(0), x)
        y0, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
        M.set_int8_inference(True)
        y1, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


class TestStaticCalibration:
    def test_layer_static_scale_used(self, rng):
        """A calibrated scale reproduces the dynamic quantization closely and
        differs from float; a wrong-key dict falls back to dynamic exactly."""
        x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 32)).astype(np.float32))
        m = M.ConvBN(64, 3, 1)
        v = m.init(jax.random.PRNGKey(0), x)
        y_f = m.apply(v, x, train=False)
        M.set_int8_inference(True)
        y_dyn = m.apply(v, x, train=False)
        absmax = float(jnp.max(jnp.abs(x)))
        M.set_int8_inference(True, scales={"conv": absmax})
        y_sta = m.apply(v, x, train=False)
        M.set_int8_inference(True, scales={"not/a/key": absmax})
        y_fall = m.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(y_sta), np.asarray(y_dyn), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(y_fall), np.asarray(y_dyn))
        assert float(jnp.max(jnp.abs(y_sta - y_f))) > 1e-4  # actually quantized

    def test_model_calibration_keys_match(self, rng):
        """calibrate_int8 harvests one scale per quantizable conv, keyed so the
        apply-time scope-path lookup finds them (full-model static engagement:
        error vs float is nonzero and bounded)."""
        from bsyolo_tpu.nn import build_model, load_model_yaml, parse_model_yaml
        from bsyolo_tpu.nn.quant import calibrate_int8

        d = load_model_yaml("tests/fixtures/tiny.yaml")
        d["nc"] = 8
        spec = parse_model_yaml(d, scale="n")
        model, variables = build_model(spec, img_size=64)
        batches = [rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32) for _ in range(2)]
        # Warm the BN running stats first: under the torch-matching conv init
        # (gain 1/3, variance-REDUCING — torch relies on train-mode BN to
        # renormalize), a fresh model's eval-mode activations collapse
        # exponentially with depth (~1e-8 by the last cls conv), so the
        # untrained output is bias-dominated and int8-vs-float error is
        # unmeasurable at the output. A few train-mode passes adapt the
        # running stats to real activation scales, like any trained model.
        warm = jax.jit(
            lambda v, xx: model.apply(v, xx, train=True, mutable=["batch_stats"])[1]
        )
        for _ in range(3):
            for b in batches:
                variables = {**variables, **warm(variables, jnp.asarray(b))}
        scales = calibrate_int8(model, variables, batches)
        assert "m0/conv" in scales  # stem conv, canonical path
        assert all(v > 0 for v in scales.values())

        x = jnp.asarray(batches[0])
        y_f = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(variables, x)
        M.set_int8_inference(True, scales=scales)
        y_s = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(variables, x)
        M.set_int8_inference(False)
        for a, b in zip(jax.tree_util.tree_leaves(y_f), jax.tree_util.tree_leaves(y_s)):
            rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
            assert 1e-6 < rel < 0.1, rel


class TestModelInt8:
    def test_model_lowering_contains_int8_convs(self):
        from bsyolo_tpu.nn import build_model, load_model_yaml, parse_model_yaml

        d = load_model_yaml("bsyolo_tpu/cfg/models/11/yolo11.yaml")
        d["nc"] = 8
        spec = parse_model_yaml(d, scale="n")
        model, variables = build_model(spec, img_size=64)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        M.set_int8_inference(True)
        txt = jax.jit(lambda v, xx: model.apply(v, xx, train=False)).lower(variables, x).as_text()
        M.set_int8_inference(False)
        assert txt.count("xi8") > 100, "int8 path did not engage in the full graph"
        txt0 = jax.jit(lambda v, xx: model.apply(v, xx, train=False)).lower(variables, x).as_text()
        assert txt0.count("xi8") == 0, "int8 leaked into the default path"


class TestInt8Export:
    def test_stablehlo_int8_roundtrip(self, tmp_path, rng):
        """`export(format="stablehlo-int8")` bakes the calibrated int8 graph
        into a portable artifact; AutoBackend reloads it and its output
        matches a fresh in-process int8 trace (same calibration seed) and
        stays near the float export."""
        from bsyolo_tpu import YOLO
        from bsyolo_tpu.engine.backend import AutoBackend

        m = YOLO("tests/fixtures/tiny.yaml")
        x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
        p_f = m.export(format="stablehlo", imgsz=64, output=str(tmp_path / "t.stablehlo"))
        p_8 = m.export(format="stablehlo-int8", imgsz=64, output=str(tmp_path / "t.stablehlo-int8"))
        assert not M.int8_inference()  # export restores the global mode
        y_f = np.asarray(AutoBackend(p_f)(x))
        y_8 = np.asarray(AutoBackend(p_8)(x))
        rel = float(np.max(np.abs(y_f - y_8)) / (np.max(np.abs(y_f)) + 1e-9))
        assert 0 < rel < 0.1, rel  # quantized but bounded vs float


@pytest.mark.slow
class TestInt8Accuracy:
    def test_trained_tiny_model_keeps_map(self, tmp_path):
        """Overfit the tiny detector on synthetic data, then val mAP50 with
        f32 vs dynamic-int8 — int8 must not cost more than 0.05 mAP50 on
        this saturated task."""
        from test_e2e_train import make_synthetic_dataset
        from bsyolo_tpu.engine.trainer import DetectionTrainer

        data = make_synthetic_dataset(tmp_path / "ds")
        t = DetectionTrainer(
            overrides={
                "model": str(Path(__file__).parent / "fixtures" / "tiny.yaml"),
                "data": str(data), "epochs": 20, "batch": 8, "imgsz": 96,
                "optimizer": "SGD", "lr0": 0.02, "warmup_epochs": 1.0,
                "close_mosaic": 8, "project": str(tmp_path / "runs"),
                "name": "t", "max_gt": 32, "amp": False, "nbs": 8,
            }
        )
        t.train()
        from bsyolo_tpu.data import DataLoader, YOLODataset, load_dataset_yaml
        from bsyolo_tpu.engine.validator import DetectionValidator

        d = load_dataset_yaml(str(data))
        ds = YOLODataset(d["val"], imgsz=96, augment=False, max_gt=32)
        loader = DataLoader(ds, 8, shuffle=False, drop_last=False)
        variables = {"params": t.state.ema_params, "batch_stats": t.state.batch_stats}

        v_f32 = DetectionValidator(t.model, t.spec)
        map50_f32 = v_f32(variables, loader).box.map50
        M.set_int8_inference(True)
        v_i8 = DetectionValidator(t.model, t.spec)
        map50_i8 = v_i8(variables, loader).box.map50
        M.set_int8_inference(False)
        assert map50_f32 > 0.5, f"training failed to converge: {map50_f32}"
        assert map50_i8 > map50_f32 - 0.05, (map50_f32, map50_i8)
