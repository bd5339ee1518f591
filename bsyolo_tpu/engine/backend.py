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
        self.meta = self._load_meta(p)
        getattr(self, f"_init_{self.kind}")()

    @staticmethod
    def _load_meta(p: Path) -> dict:
        """Exporter sidecar metadata (names/nc/imgsz/nms), when present."""
        import json

        for cand in (Path(str(p) + ".json"), p / "bsyolo_meta.json" if p.is_dir() else None):
            if cand is not None and cand.exists():
                try:
                    return json.loads(cand.read_text())
                except (OSError, ValueError):
                    return {}
        return {}

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
            return decode_detections(
                out, spec.head_strides, spec.nc, reg_max=getattr(spec, "reg_max", 16)
            )

        self._fn = lambda x: np.asarray(run(jnp.asarray(x)))

    # --- uniform surface ----------------------------------------------
    def forward(self, im: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) float32 [0,1] -> (B, A, 4+nc) raw predictions."""
        return np.asarray(self._fn(np.asarray(im, np.float32)))

    __call__ = forward

    def warmup(self, batch: int = 1):
        self.forward(np.zeros((batch, self.imgsz, self.imgsz, 3), np.float32))
        return self


def artifact_contract(backend: "AutoBackend", batch: int, imgsz: int, fallback_names=None):
    """Probe an artifact's output contract: (e2e, nc, names).

    e2e artifacts (nms=True / v10 / RT-DETR exports) emit (B, max_det, 6)
    xyxy/conf/cls; decode-only artifacts emit (B, A, 4+nc) and need
    consumer-side NMS. Uses the exporter's meta sidecar when present (no
    probe inference needed), probe shapes otherwise."""
    meta = backend.meta
    out_desc = meta.get("output", "")
    if meta.get("nms") or "xyxy" in out_desc:
        e2e = True
    elif out_desc:
        e2e = False
    else:
        # no sidecar: probe. (…, 6) is ambiguous with a 2-class decode
        # graph; the exporter always writes the sidecar, so this is a
        # foreign artifact and the heuristic is best-effort
        probe = backend.forward(np.zeros((batch, imgsz, imgsz, 3), np.float32))
        probe = probe[0] if isinstance(probe, (list, tuple)) else probe
        e2e = probe.shape[-1] == 6
        meta = {**meta, "nc": meta.get("nc") or (0 if e2e else int(probe.shape[-1]) - 4)}
    nc = int(meta.get("nc") or 0)
    names_meta = meta.get("names") or fallback_names
    if isinstance(names_meta, dict):
        names = {int(k): v for k, v in names_meta.items()}
    elif names_meta:
        names = {i: n for i, n in enumerate(names_meta)}
    else:
        names = {i: str(i) for i in range(max(nc, 1))}
    nc = nc or len(names)
    return e2e, nc, names


def validate_artifact(
    weights: str,
    data: str,
    batch: int = 16,
    imgsz: Optional[int] = None,
    conf: float = 0.001,
    iou: float = 0.7,
    max_det: int = 300,
    split: str = "val",
    verbose: bool = True,
    backend: Optional["AutoBackend"] = None,
    **kwargs,
):
    """mAP-validate an exported artifact (reference `yolo val model=best.onnx`,
    nn/autobackend.py + engine/validator.py).

    Detect-family artifacts only (enforced against the meta sidecar's task):
    the artifact's embedded predict path must emit either decode-only
    (B, A, 4+nc) predictions (NMS applied here, matching the validator's
    thresholds) or an end-to-end (B, max_det, 6) output (nms=True / v10 /
    RT-DETR exports — used as-is, so conf/iou overrides don't apply to
    those). Pass a prebuilt ``backend`` to reuse a loaded artifact.
    """
    import jax
    import jax.numpy as jnp

    from bsyolo_tpu.data import DataLoader, YOLODataset, load_dataset_yaml
    from bsyolo_tpu.engine.validator import DetectionValidator
    from bsyolo_tpu.ops.nms import non_max_suppression
    from bsyolo_tpu.utils import LOGGER

    backend = backend or AutoBackend(weights, imgsz or 640)
    meta = backend.meta
    task = meta.get("task")
    if task is not None and task != "detect":
        raise ValueError(
            f"artifact validation supports detect-family artifacts; this one "
            f"was exported from a '{task}' model (its output layout needs the "
            f"{task} validator — rebuild from the .yaml/.ckpt to val it)"
        )
    art_imgsz = int(meta.get("imgsz", 0) or 0)
    if art_imgsz and imgsz and imgsz != art_imgsz:
        LOGGER.info(
            f"artifact was exported at imgsz={art_imgsz} (static shapes); "
            f"validating at that size instead of imgsz={imgsz}"
        )
    imgsz = art_imgsz or imgsz or 640
    backend.imgsz = imgsz
    art_batch = int(meta.get("batch", 1))
    if batch != art_batch:
        LOGGER.info(
            f"artifact was exported with batch={art_batch} (static shapes); "
            f"validating at that batch instead of batch={batch}"
        )
        batch = art_batch

    d = load_dataset_yaml(data)
    if not d.get(split):
        raise KeyError(f"dataset {data} has no '{split}' split")
    ds = YOLODataset(d[split], imgsz=imgsz, augment=False, max_gt=kwargs.get("max_gt", 128))
    loader = DataLoader(ds, batch, shuffle=False, drop_last=False)

    e2e, nc, names = artifact_contract(backend, batch, imgsz, fallback_names=d.get("names"))

    from types import SimpleNamespace

    spec = SimpleNamespace(task="detect", nc=nc, names=tuple(names.values()), head_strides=(8, 16, 32))

    # the NMS stage is pure jax on a fixed shape: compile it once rather
    # than dispatching the greedy loop eagerly per batch
    nms_fn = jax.jit(
        lambda p: non_max_suppression(
            p, conf_thres=conf, iou_thres=iou, max_det=max_det, nc=nc
        )
    )

    def forward_fn(variables, img):
        img = np.asarray(img)
        if img.dtype == np.uint8:  # loader batches ship uint8; artifacts take f32 [0,1]
            img = img.astype(np.float32) / 255.0
        preds = backend.forward(np.asarray(img, np.float32))
        preds = preds[0] if isinstance(preds, (list, tuple)) else preds
        if e2e:
            return preds
        return nms_fn(jnp.asarray(preds))

    validator = DetectionValidator(
        model=None, spec=spec, conf=conf, iou=iou, max_det=max_det, names=names,
        forward_fn=forward_fn,
    )
    return validator(None, loader, verbose=verbose)
