"""Post-training int8 calibration for the ConvBN int8 inference path.

The reference's int8 story is TensorRT/TFLite calibration performed by an
external toolchain (reference engine/exporter.py int8=True + calibration
dataloader). Here quantization is a trace-time mode of the SAME jax graph
(nn/modules.py `_RawConv`): this pass harvests per-conv activation ranges so
the activation scale becomes a compile-time constant — XLA then fuses the
quantize (round/clip/cast-to-int8) into the producing layer's epilogue and
the conv streams int8 from HBM (half the bytes of bf16) into the MXU's
int8 path (~2x bf16 peak on v5e).

Usage:
    scales = calibrate_int8(model, variables, batches)   # a few batches
    set_int8_inference(True, scales=scales)               # static int8
    ... jit/trace any forward as usual ...
"""

from __future__ import annotations

from typing import Dict, Iterable

import jax
import jax.numpy as jnp

from bsyolo_tpu.nn import modules as M


def _harvest(intermediates) -> Dict[str, float]:
    """Flatten a sown intermediates tree to {module_path: absmax}."""
    out: Dict[str, float] = {}
    flat = jax.tree_util.tree_flatten_with_path(intermediates)[0]
    for path, leaf in flat:
        keys = [k.key for k in path if isinstance(k, jax.tree_util.DictKey)]
        if not keys or keys[-1] != "act_absmax":
            continue
        key = "/".join(keys[:-1])
        out[key] = max(out.get(key, 0.0), float(leaf))
    return out


def calibrate_int8(model, variables, batches: Iterable) -> Dict[str, float]:
    """Run ``batches`` (arrays shaped like the model input) through the
    model in float, recording each quantizable conv's input abs-max.

    Returns {module_path: absmax} for ``set_int8_inference(scales=...)``.
    Running max over batches — the standard max-calibration PTQ scheme
    (reference exporter's int8 path delegates the same job to TFLite's
    representative_dataset loop).
    """
    M.set_int8_calibration(True)
    try:

        @jax.jit
        def fwd(v, x):
            _, mut = model.apply(v, x, train=False, mutable=["intermediates"])
            return mut["intermediates"]

        scales: Dict[str, float] = {}
        for x in batches:
            inter = jax.device_get(fwd(variables, jnp.asarray(x)))
            for k, v in _harvest(inter).items():
                scales[k] = max(scales.get(k, 0.0), v)
    finally:
        M.set_int8_calibration(False)
    if not scales:
        raise ValueError("calibration saw no quantizable convs (no ConvBN with groups=1?)")
    return scales
