"""Command-line interface (maps reference ultralytics/cfg/__init__.py:818 entrypoint).

Same grammar as the reference `yolo` tool:

    python -m bsyolo_tpu TASK MODE k=v ...
    python -m bsyolo_tpu detect train data=car.yaml model=yolo11n.yaml epochs=200
    python -m bsyolo_tpu predict model=best.ckpt source=img.jpg
    python -m bsyolo_tpu val model=best.ckpt data=car.yaml
    python -m bsyolo_tpu export model=best.ckpt format=stablehlo
    python -m bsyolo_tpu cfg | version | help | checks | settings | copy-cfg
    python -m bsyolo_tpu settings datasets_dir=/data/datasets
    python -m bsyolo_tpu solutions count source=video.mp4 region="[(0,360),(1280,360)]"

TASK defaults to detect; MODE is required (train/val/predict/track/export/benchmark).
Solutions: count, heatmap, speed, queue, workout, analytics, trackzone.
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
                    if v and v[0] in "[({":
                        # structured values: region="[(0,360),(1280,360)]" etc.
                        import ast

                        try:
                            v = ast.literal_eval(v)
                        except (ValueError, SyntaxError):
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
    if argv[0] == "settings":
        # view / update / reset the persisted settings (reference
        # cfg/__init__.py:580 handle_yolo_settings)
        from bsyolo_tpu.utils.settings import SettingsManager

        s = SettingsManager()
        rest = argv[1:]
        if rest and rest[0] == "reset":
            s.reset()
            LOGGER.info("settings reset to defaults")
        elif rest:
            kv = parse_kv(rest)
            unknown = [k for k in kv if k not in s]
            if unknown:
                # reference handle_yolo_settings raises on unknown keys too —
                # a typo must not silently persist junk
                raise SyntaxError(
                    f"unknown settings key(s) {unknown}; valid: {sorted(s)}"
                )
            s.update(kv)
        import json as _json

        print(_json.dumps(dict(s), indent=2))
        return 0
    if argv[0] == "copy-cfg":
        # copy the packaged default.yaml for editing (reference copy_default_cfg)
        import shutil
        from pathlib import Path

        from bsyolo_tpu.cfg import DEFAULT_CFG_PATH

        dst = Path.cwd() / "default_copy.yaml"
        shutil.copy2(DEFAULT_CFG_PATH, dst)
        LOGGER.info(f"copied default cfg to {dst} — use with: cfg={dst.name}")
        return 0
    if argv[0] == "solutions":
        return _run_solution(argv[1:])

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
        if overrides.get("data") or model_arg != "yolo11n.yaml":
            # reference `yolo benchmark model=...`: per-format export/val table
            rows = model.benchmark(
                imgsz=int(overrides.get("imgsz") or 320),
                data=overrides.get("data"),
                batch=int(overrides.get("batch") or 8),
            )
            for r in rows:
                LOGGER.info(str(r))
        else:  # bare `benchmark`: the repo's TPU throughput harness
            import subprocess

            subprocess.run([sys.executable, "bench.py"], check=False)
    return 0


def _run_solution(argv) -> int:
    """`solutions NAME k=v ...` verb (reference cfg/__init__.py:621
    handle_yolo_solutions): runs a video-analytics solution over a source."""
    from bsyolo_tpu import YOLO
    from bsyolo_tpu import solutions as S

    # (class, per-frame method) per solution name
    table = {
        "count": (S.ObjectCounter, "count"),
        "heatmap": (S.Heatmap, "generate_heatmap"),
        "speed": (S.SpeedEstimator, "estimate_speed"),
        "queue": (S.QueueManager, "process_queue"),
        "workout": (S.AIGym, "monitor"),
        "analytics": (S.Analytics, "update"),
        "trackzone": (S.TrackZone, "trackzone"),
    }
    name = argv[0] if argv and "=" not in argv[0] else "count"
    rest = argv[1:] if argv and "=" not in argv[0] else argv
    if name not in table:
        raise SyntaxError(f"unknown solution '{name}'; available: {sorted(table)}")
    kv = parse_kv(rest)
    source = kv.pop("source", None)
    if source is None:
        raise SyntaxError("solutions requires source=<video|dir>")
    model = YOLO(kv.pop("model", None) or "yolo11n.yaml")
    region = kv.pop("region", None)
    cls, method = table[name]
    needs_region = name in ("count", "queue", "trackzone")
    if needs_region and region is None:
        region = [(0, 0), (10_000, 0), (10_000, 10_000), (0, 10_000)]
    # remaining k=v flow to the solution: constructor options (up_angle,
    # analytics_type, ...) are consumed there; the rest (conf, iou, imgsz,
    # ...) ride BaseSolution.kwargs into model.track(). Heatmap/SpeedEstimator/
    # AIGym/Analytics pin region themselves — region only goes to the
    # region-parameterized solutions.
    if region is not None and needs_region:
        kv["region"] = region
    elif region is not None:
        LOGGER.warning(f"solution '{name}' does not take a region; ignoring it")
    sol = cls(model=model, **kv)
    from bsyolo_tpu.engine.predictor import iter_source

    n = 0
    last = None
    for frame, _path, _is_video in iter_source(source):
        last = getattr(sol, method)(frame)
        n += 1
    LOGGER.info(f"solution '{name}' processed {n} frames; final: {last}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
