"""Self-contained ONNX export + runtime (maps reference engine/exporter.py ONNX path).

The reference's most-used export format is ONNX (reference engine/exporter.py:101,
export_onnx at engine/exporter.py:463) via the torch exporter + the `onnx` package.
Neither toolchain exists in this image, so this package implements the format from
first principles, with zero dependencies:

- ``proto``   — a protobuf wire-format codec plus the ONNX message schema
                (field numbers transcribed from the public ``onnx.proto3``).
- ``builder`` — an ONNX GraphProto/ModelProto builder.
- ``lower``   — lowers a **jaxpr** (the traced predict function, params baked
                as constants) to an ONNX opset-13 graph. Because it walks jax
                primitives rather than per-module emitters, any model the YAML
                parser can build exports automatically as long as its forward
                stays inside the supported primitive set.
- ``runtime`` — an independent numpy evaluator for the emitted op set; doubles
                as the AutoBackend ``.onnx`` runtime (engine/backend.py).

Validation (documented honestly): the wire format is checked by round-tripping
through the bundled decoder and by ``protoc --decode_raw``; numerics are checked
end-to-end against the JAX forward. ``onnxruntime`` itself is not in this image,
so cross-runtime execution is untested here — the emitted graphs use only
standard opset-13 ops with static shapes to keep that surface small.
"""

from bsyolo_tpu.onnx.lower import export_onnx  # noqa: F401
from bsyolo_tpu.onnx.runtime import OnnxModule  # noqa: F401
