"""Model export (maps reference engine/exporter.py).

The reference fans out to 14 runtime formats from torch; the TPU-native
equivalents are the XLA-ecosystem ones:

- stablehlo: serialized StableHLO via jax.export — the portable artifact —
  plus a `.stablehlo.mlir` sidecar (the raw module bytecode, params baked as
  constants) that examples/cpp_client/pjrt_main.cpp hands straight to
  PJRT_Client_Compile: a generic PJRT-C-API C++ runner that works against
  any plugin exporting GetPjrtApi (libtpu.so, this image's relay plugin).
  tests/test_pjrt_client.py checks box parity vs the Python path (the TPU
  leg is relay-gated). The second native-client path is saved_model + the
  TF C API: examples/cpp_client/main.cpp executes it end to end (N3-N8
  analog).
- params: raw weights checkpoint (.ckpt)
- saved_model / tflite: via jax2tf when tensorflow is present (gated)
- onnx: self-contained opset-13 export (bsyolo_tpu/onnx — jaxpr lowering +
  protobuf wire codec, no torch/onnx toolchain); AutoBackend runs the
  artifact through the bundled numpy evaluator

Each export embeds the full predict path (forward + decode; NMS optional)
with static shapes.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

from bsyolo_tpu.utils import LOGGER


def _build_export_predict(spec, model, variables, nms: bool):
    """Per-task export closure (decode-only except detect+nms / e2e heads).

    Mirrors the reference exporter's task fan-out (reference
    engine/exporter.py:302 get export metadata per task; models/yolo/*/
    predict decode): every artifact embeds forward + decode with static
    shapes; NMS stays consumer-side except the inherently NMS-free heads
    (v10, RT-DETR) and the explicit nms=True detect path.
    """
    import jax
    import jax.numpy as jnp

    from bsyolo_tpu.nn.heads import (
        decode_detections,
        decode_extras,
        decode_keypoints,
        decode_obb,
        postprocess_e2e,
    )
    from bsyolo_tpu.ops.nms import non_max_suppression

    head_module = getattr(spec.head, "module", "")
    strides, nc = spec.head_strides, spec.nc

    if nms and (spec.task != "detect" or head_module in ("v10Detect", "RTDETRDecoder")):
        raise ValueError(
            "nms=True export is only supported for the plain Detect head; "
            "v10/RT-DETR are NMS-free and other tasks decode consumer-side"
        )

    if spec.task == "classify":

        def predict(x):
            logits = model.apply(variables, x, train=False)
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        return predict, "(B, nc) softmax probs"

    if spec.task == "segment":

        def predict(x):
            out = model.apply(variables, x, train=False)
            feats, proto = out["feats"], out["proto"]
            preds = decode_detections(feats, strides, nc)
            coeffs = decode_extras(feats, nc)
            return jnp.concatenate([preds, coeffs], axis=-1), proto

        return predict, "((B, anchors, 4+nc+nm) xywh+scores+coeffs, (B, h/4, w/4, nm) proto NHWC)"

    if spec.task == "pose":
        kpt_shape = spec.kpt_shape

        def predict(x):
            feats = model.apply(variables, x, train=False)
            preds = decode_detections(feats, strides, nc)
            kflat = decode_extras(feats, nc)
            kpts = decode_keypoints(kflat, feats, strides, kpt_shape)
            b, a = kpts.shape[0], kpts.shape[1]
            return jnp.concatenate([preds, kpts.reshape(b, a, -1)], axis=-1)

        return predict, f"(B, anchors, 4+nc+{kpt_shape[0] * kpt_shape[1]}) xywh+scores+decoded kpts"

    if spec.task == "obb":

        def predict(x):
            return decode_obb(model.apply(variables, x, train=False), strides, nc)

        return predict, "(B, anchors, 4+nc+1) xywh+scores+angle(rad)"

    if head_module == "v10Detect":

        def predict(x):
            out = model.apply(variables, x, train=False)
            preds = decode_detections(out["one2one"], strides, nc)
            return postprocess_e2e(preds, max_det=300, nc=nc)

        return predict, "(B, 300, 6) xyxy conf cls (NMS-free e2e)"

    if head_module == "RTDETRDecoder":
        from bsyolo_tpu.nn.transformer import decode_rtdetr

        def predict(x):
            out = model.apply(variables, x, train=False)
            return decode_rtdetr(out, (x.shape[1], x.shape[2]), conf_thres=0.0, max_det=300)

        return predict, "(B, 300, 6) xyxy conf cls (NMS-free queries)"

    def predict(x):
        feats = model.apply(variables, x, train=False)
        preds = decode_detections(feats, strides, nc, reg_max=getattr(spec, "reg_max", 16))
        if nms:
            return non_max_suppression(preds, conf_thres=0.25, iou_thres=0.7, max_det=300)
        return preds

    return predict, "(B, 300, 6) xyxy conf cls" if nms else "(B, anchors, 4+nc) xywh+scores"


def _write_meta(out, spec, imgsz, batch, nms, output_desc, extra=None, path=None):
    """One meta-sidecar writer for every format (AutoBackend/validate_artifact
    read this contract): imgsz/batch pin the static shapes, task gates
    artifact validation, names feed metrics."""
    meta = {
        "imgsz": imgsz, "batch": batch, "nc": spec.nc, "names": list(spec.names),
        "task": spec.task, "nms": nms, "input": "NHWC float32 [0,1] RGB",
        "output": output_desc,
    }
    if extra:
        meta.update(extra)
    (path or Path(str(out) + ".json")).write_text(json.dumps(meta, indent=2))


def export_model(
    yolo,
    format: str = "stablehlo",
    imgsz: Optional[int] = None,
    batch: int = 1,
    nms: bool = False,
    output: Optional[str] = None,
):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    imgsz = imgsz or yolo._img_size
    spec = yolo.spec
    model = yolo.model
    variables = yolo.variables
    if getattr(yolo, "txt_feats", None) is not None:
        # YOLOWorld with set_classes: bake the text embeddings into the graph
        from bsyolo_tpu.model import _TextConditioned

        model = _TextConditioned(model, yolo.txt_feats)

    predict, output_desc = _build_export_predict(spec, model, variables, nms)

    x_spec = jax.ShapeDtypeStruct((batch, imgsz, imgsz, 3), jnp.float32)
    name = Path(yolo.model_path).stem
    out = Path(output or f"{name}.{format}")

    if format == "stablehlo-int8":
        # the on-device int8 path (nn/modules._RawConv) baked into a portable
        # artifact: calibrate activation scales on a short random sweep (or
        # the caller can pre-set scales via set_int8_inference), then trace
        # the SAME predict fn with the int8 mode on — quantize/dequantize and
        # the int8 convs become part of the serialized StableHLO.
        import numpy as _np

        from bsyolo_tpu.nn.modules import int8_inference, set_int8_inference
        from bsyolo_tpu.nn.quant import calibrate_int8

        preset = int8_inference()
        if not preset:
            rng = _np.random.default_rng(0)
            scales = calibrate_int8(
                model, variables,
                [rng.uniform(0, 1, (batch, imgsz, imgsz, 3)).astype(_np.float32) for _ in range(4)],
            )
            set_int8_inference(True, scales=scales)
        try:
            exported = jexport.export(jax.jit(predict))(x_spec)
        finally:
            if not preset:
                set_int8_inference(False)
        out = Path(output or f"{name}.stablehlo-int8")
        blob = exported.serialize()
        out.write_bytes(blob)
        _write_meta(out, spec, imgsz, batch, nms, output_desc,
                    extra={"quant": "int8 convs, per-out-channel weight + static activation scales"})
        LOGGER.info(f"exported int8 StableHLO to {out} ({len(blob)} bytes)")
        return str(out)

    if format == "stablehlo":
        exported = jexport.export(jax.jit(predict))(x_spec)
        blob = exported.serialize()
        out.write_bytes(blob)
        # PJRT-consumable sidecar: the raw StableHLO module bytecode (params
        # baked in as constants). examples/cpp_client/pjrt_main.cpp hands
        # this straight to PJRT_Client_Compile on any PJRT plugin.
        Path(str(out) + ".mlir").write_bytes(exported.mlir_module_serialized)
        _write_meta(out, spec, imgsz, batch, nms, output_desc)
        LOGGER.info(f"exported StableHLO to {out} ({len(blob)} bytes)")
        return str(out)

    if format == "onnx":
        # Self-contained ONNX (reference engine/exporter.py:463 export_onnx):
        # no torch/onnx toolchain — the jitted predict fn's jaxpr is lowered
        # to opset-13 ops and serialized by bsyolo_tpu/onnx. nms=True bakes
        # the exact-greedy NMS in (the fixed-point while loop lowers to an
        # ONNX Loop subgraph) for a (B, 300, 6) end-to-end artifact.
        from bsyolo_tpu.onnx import export_onnx

        out = out.with_suffix(".onnx")
        export_onnx(
            predict,
            [jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)],
            out,
            input_names=["images"],
            output_names=["output0", "output1"],
            name=name,
        )
        _write_meta(out, spec, imgsz, batch, nms, output_desc, extra={"opset": 13})
        LOGGER.info(f"exported ONNX (opset 13) to {out}")
        return str(out)

    if format == "params":
        return yolo.save(str(out.with_suffix(".ckpt")))

    if format in ("saved_model", "tflite", "tflite-fp16", "tflite-int8"):
        try:
            import tensorflow as tf
            from jax.experimental import jax2tf
        except ImportError as e:
            raise RuntimeError(f"format '{format}' requires tensorflow: {e}")
        tf_fn = tf.function(
            jax2tf.convert(predict, with_gradient=False),
            input_signature=[tf.TensorSpec((batch, imgsz, imgsz, 3), tf.float32)],
            autograph=False,
        )
        module = tf.Module()
        module.f = tf_fn
        if format == "saved_model":
            # export with a serving signature so C/C++ clients can bind the
            # graph I/O by name (examples/cpp_client runs this via TF C API)
            tf.saved_model.save(
                module, str(out), signatures={"serving_default": tf_fn.get_concrete_function()}
            )
            _write_meta(out, spec, imgsz, batch, nms, output_desc,
                        path=Path(str(out)) / "bsyolo_meta.json")
            return str(out)
        converter = tf.lite.TFLiteConverter.from_concrete_functions(
            [tf_fn.get_concrete_function()], module
        )
        if format == "tflite-fp16":
            converter.optimizations = [tf.lite.Optimize.DEFAULT]
            converter.target_spec.supported_types = [tf.float16]
        elif format == "tflite-int8":
            # full-int8 with a calibration sweep (reference exporter int8 path,
            # engine/exporter.py TFLite int8); inputs/outputs stay float for
            # drop-in parity with the fp32 artifact
            import numpy as _np

            rng = _np.random.default_rng(0)

            def representative():
                for _ in range(16):
                    yield [rng.uniform(0, 1, (batch, imgsz, imgsz, 3)).astype(_np.float32)]

            converter.optimizations = [tf.lite.Optimize.DEFAULT]
            converter.representative_dataset = representative
        blob = converter.convert()
        out = Path(str(out.with_suffix("")) + format.replace("tflite", "").replace("-", "_")).with_suffix(".tflite")
        out.write_bytes(blob)
        _write_meta(out, spec, imgsz, batch, nms, output_desc)
        return str(out)

    raise ValueError(
        f"unsupported export format: {format} "
        "(available: stablehlo, stablehlo-int8, onnx, params, saved_model, "
        "tflite, tflite-fp16, tflite-int8)"
    )


def load_stablehlo(path: str):
    """Rehydrate an exported StableHLO artifact into a callable (client side)."""
    from jax import export as jexport

    exported = jexport.deserialize(Path(path).read_bytes())
    return exported.call
