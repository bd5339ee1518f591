"""bsyolo_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the BS-YOLO framework.

Re-implements the capabilities of the feiyeha/BS-YOLO fork of ultralytics
(YOLO11 + PMSFA/C3k2_gai/SCDown/MSCAAttention/ELA architecture deltas, the
EMA-Slide/NWD training losses, and the blind-sidewalk parking-violation
application) as an idiomatic JAX framework:

- NHWC layouts, bf16 compute / f32 params, static shapes end to end
- functional core (pure ``params, batch -> loss/preds``), thin stateful shell
- data-parallel training via ``jax.sharding.Mesh`` + jit shardings
- fused Pallas kernels for the detect-decode/NMS hot path

The public facade mirrors the reference API surface
(``YOLO(...).train/val/predict/track/export``; reference:
ultralytics/engine/model.py).
"""

__version__ = "0.1.0"

__all__ = ["YOLO", "YOLOWorld", "RTDETR", "SAM", "FastSAM", "NAS", "__version__"]


def __getattr__(name):  # lazy: keep `import bsyolo_tpu.ops` cheap (no engine deps)
    if name in ("YOLO", "YOLOWorld", "RTDETR"):
        import bsyolo_tpu.model as _m

        return getattr(_m, name)
    if name in ("SAM", "FastSAM", "NAS"):
        import bsyolo_tpu.models as _models

        return getattr(_models, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
