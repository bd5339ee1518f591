"""Command-line interface (maps reference ultralytics/cfg/__init__.py:818 entrypoint).

Same grammar as the reference `yolo` tool:

    python -m bsyolo_tpu TASK MODE k=v ...
    python -m bsyolo_tpu detect train data=car.yaml model=yolo11n.yaml epochs=200
    python -m bsyolo_tpu predict model=best.ckpt source=img.jpg
    python -m bsyolo_tpu val model=best.ckpt data=car.yaml
    python -m bsyolo_tpu export model=best.ckpt format=stablehlo
    python -m bsyolo_tpu cfg | version | help | checks

TASK defaults to detect; MODE is required (train/val/predict/track/export/benchmark).
"""

from __future__ import annotations

import sys
from typing import Dict, List

from bsyolo_tpu.cfg import DEFAULT_CFG_DICT, check_dict_alignment
from bsyolo_tpu.utils import LOGGER

TASKS = {"detect", "segment", "classify", "pose", "obb"}
MODES = {"train", "val", "predict", "track", "export", "benchmark"}

HELP = __doc__


def parse_kv(args: List[str]) -> Dict:
    out = {}
    for a in args:
        if "=" not in a:
            raise SyntaxError(f"arguments must be k=v pairs, got '{a}'")
        k, v = a.split("=", 1)
        if v.lower() in ("true", "false"):
            v = v.lower() == "true"
        elif v.lower() in ("none", "null", ""):
            v = None
        else:
            try:
                v = int(v)
            except ValueError:
                try:
                    v = float(v)
                except ValueError:
                    pass
        out[k] = v
    return out


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("help", "-h", "--help"):
        print(HELP)
        return 0
    if argv[0] == "version":
        from bsyolo_tpu import __version__

        print(__version__)
        return 0
    if argv[0] == "cfg":
        import yaml

        print(yaml.safe_dump(DEFAULT_CFG_DICT, sort_keys=False))
        return 0
    if argv[0] == "checks":
        import jax

        import bsyolo_tpu

        print(f"bsyolo_tpu {bsyolo_tpu.__version__}")
        print(f"jax {jax.__version__}, devices: {jax.devices()}")
        return 0

    task = "detect"
    mode = None
    rest = []
    for a in argv:
        if a in TASKS:
            task = a
        elif a in MODES:
            mode = a
        else:
            rest.append(a)
    if mode is None:
        raise SyntaxError(f"a mode is required: one of {sorted(MODES)}")
    overrides = parse_kv(rest)
    known = dict(DEFAULT_CFG_DICT)
    known.update({"model": None, "data": None, "source": None})
    check_dict_alignment(known, overrides)
    if task not in ("detect", "classify", "segment", "pose", "obb"):
        raise NotImplementedError(f"task '{task}' is not supported")

    from bsyolo_tpu import YOLO

    model_arg = overrides.pop("model", None) or "yolo11n.yaml"
    model = YOLO(model_arg)

    if mode == "train":
        metrics = model.train(**overrides)
        if metrics:
            LOGGER.info(f"results: {metrics.results_dict}")
    elif mode == "val":
        metrics = model.val(**overrides)
        LOGGER.info(f"results: {metrics.results_dict}")
    elif mode in ("predict", "track"):
        source = overrides.pop("source", None)
        if source is None:
            raise SyntaxError("predict/track requires source=<path>")
        overrides.setdefault("save", True)
        overrides.setdefault("verbose", True)
        fn = model.track if mode == "track" else model.predict
        results = fn(source, **overrides)
        LOGGER.info(f"{len(results)} frames processed")
    elif mode == "export":
        out = model.export(
            format=overrides.get("format", "stablehlo"),
            imgsz=overrides.get("imgsz"),
            nms=bool(overrides.get("nms", False)),
        )
        LOGGER.info(f"exported: {out}")
    elif mode == "benchmark":
        import subprocess

        subprocess.run([sys.executable, "bench.py"], check=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
