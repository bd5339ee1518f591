"""AutoBackend: one forward() over every deployable artifact
(reference nn/autobackend.py:54).

The reference fans out over 14 GPU/CPU runtimes; the TPU-relevant set here:

- ``*.stablehlo`` — jax.export artifact (runs on TPU/CPU through XLA)
- SavedModel directory — TF runtime (what the C++ client uses)
- ``*.tflite`` — LiteRT interpreter (fp32/fp16/int8 artifacts)
- ``*.onnx`` — self-contained ONNX artifact via the bundled numpy evaluator
  (bsyolo_tpu/onnx; reference runs these through onnxruntime, absent here)
- ``*.ckpt`` — native flax checkpoint -> jitted apply
- ``*.yaml`` — fresh model (dev convenience)

All paths expose ``forward(im) -> (B, A, 4+nc)`` numpy plus ``warmup()``,
so validators/predictors can run any artifact interchangeably.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


class AutoBackend:
    def __init__(self, weights: str, imgsz: int = 640):
        self.path = str(weights)
        self.imgsz = imgsz
        p = Path(self.path)
        self.kind = (
            "saved_model" if p.is_dir() and (p / "saved_model.pb").exists()
            else "stablehlo" if p.suffix in (".stablehlo", ".stablehlo-int8")
            or p.name.endswith(".stablehlo-int8")
            else "tflite" if p.suffix == ".tflite"
            else "onnx" if p.suffix == ".onnx"
            else "ckpt" if p.suffix == ".ckpt"
            else "yaml" if p.suffix in (".yaml", ".yml")
            else None
        )
        if self.kind is None:
            raise ValueError(
                f"unsupported artifact: {weights} (supported: .stablehlo, "
                "SavedModel dir, .tflite, .onnx, .ckpt, .yaml)"
            )
        getattr(self, f"_init_{self.kind}")()

    # --- loaders ------------------------------------------------------
    def _init_stablehlo(self):
        from bsyolo_tpu.engine.exporter import load_stablehlo

        self._fn = load_stablehlo(self.path)

    def _init_saved_model(self):
        import tensorflow as tf

        sm = tf.saved_model.load(self.path)
        f = sm.signatures.get("serving_default") or sm.f
        self._tf = tf

        def run(x):
            out = f(tf.constant(x))
            if isinstance(out, dict):
                out = next(iter(out.values()))
            return out.numpy()

        self._fn = run

    def _init_tflite(self):
        import tensorflow as tf

        it = tf.lite.Interpreter(model_path=self.path)
        it.allocate_tensors()
        inp = it.get_input_details()[0]
        outp = it.get_output_details()[0]

        def run(x):
            it.set_tensor(inp["index"], np.asarray(x, np.float32))
            it.invoke()
            return it.get_tensor(outp["index"])

        self._fn = run

    def _init_onnx(self):
        # the bundled numpy evaluator (bsyolo_tpu/onnx/runtime.py) — a
        # CPU-reference runtime, not a serving path; serving artifacts are
        # stablehlo (PJRT) and saved_model (TF C API)
        from bsyolo_tpu.onnx import OnnxModule

        module = OnnxModule(self.path)
        self._fn = lambda x: module(np.asarray(x, np.float32))[0]

    def _init_ckpt(self):
        self._init_model(self.path)

    def _init_yaml(self):
        self._init_model(self.path)

    def _init_model(self, path: str):
        import jax
        import jax.numpy as jnp

        from bsyolo_tpu.model import YOLO
        from bsyolo_tpu.nn.heads import decode_detections

        y = YOLO(path)
        spec = y.spec

        from bsyolo_tpu.nn.heads import postprocess_e2e  # noqa: F401 (doc)

        @jax.jit
        def run(x):
            out = y.model.apply(y.variables, x, train=False)
            if isinstance(out, dict):
                if "feats" in out:  # Segment head: boxes+coeff maps
                    out = out["feats"]
                elif "one2one" in out:  # v10 NMS-free head
                    out = out["one2one"]
                else:
                    raise TypeError(
                        f"AutoBackend detection decode does not support this head "
                        f"output ({sorted(out)}); use the task facade instead"
                    )
            return decode_detections(out, spec.head_strides, spec.nc)

        self._fn = lambda x: np.asarray(run(jnp.asarray(x)))

    # --- uniform surface ----------------------------------------------
    def forward(self, im: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) float32 [0,1] -> (B, A, 4+nc) raw predictions."""
        return np.asarray(self._fn(np.asarray(im, np.float32)))

    __call__ = forward

    def warmup(self, batch: int = 1):
        self.forward(np.zeros((batch, self.imgsz, self.imgsz, 3), np.float32))
        return self
