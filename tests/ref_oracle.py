"""Golden-oracle loader for parity tests.

The full reference package (/root/reference, PyTorch) is not importable in
this environment (no torchvision). Instead we surgically extract specific
top-level functions/classes from reference source files with AST and exec
them in a minimal namespace. This keeps parity tests honest (they run the
reference's actual code) without importing its package machinery.
"""

from __future__ import annotations

import ast
import functools
import math
from pathlib import Path

REF = Path("/root/reference")


@functools.lru_cache(maxsize=None)
def _extract(relpath: str, names: tuple) -> dict:
    """Exec selected top-level defs from a reference file; return the namespace.

    Functions defined here share the returned dict as __globals__, so callers
    can inject late dependencies by mutating it.
    """
    import numpy as np
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    src = (REF / relpath).read_text()
    tree = ast.parse(src)
    wanted = [
        node
        for node in tree.body
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)) and node.name in names
    ]
    missing = set(names) - {n.name for n in wanted}
    if missing:
        raise KeyError(f"{relpath}: not found: {missing}")
    mod = ast.Module(body=wanted, type_ignores=[])
    ns = {
        "torch": torch,
        "nn": nn,
        "F": F,
        "np": np,
        "math": math,
        "__name__": f"ref_oracle.{relpath}",
    }
    exec(compile(mod, str(REF / relpath), "exec"), ns)
    return ns


def ops_fns():
    return _extract("ultralytics/utils/ops.py", ("xyxy2xywh", "xywh2xyxy", "empty_like"))


def metrics(*names):
    """Functions from ultralytics/utils/metrics.py (inner_iou deps injected)."""
    ns = _extract("ultralytics/utils/metrics.py", tuple(sorted(set(names) | {"inner_iou", "bbox_iou"})))
    ns.update({k: v for k, v in ops_fns().items() if not k.startswith("__")})
    return ns


def tal(*names):
    """Functions/classes from ultralytics/utils/tal.py (bbox_iou injected)."""
    ns = _extract("ultralytics/utils/tal.py", tuple(names))
    m = metrics("bbox_iou")
    ns.setdefault("bbox_iou", m["bbox_iou"])
    ns.setdefault("LOGGER", _FakeLogger())
    ns.setdefault("check_version", lambda *a, **k: True)
    ns.setdefault("TORCH_1_10", True)
    return ns


def loss(*names):
    """Functions/classes from ultralytics/utils/loss.py (deps injected)."""
    ns = _extract("ultralytics/utils/loss.py", tuple(names))
    dep = tal("bbox2dist", "dist2bbox", "make_anchors", "TaskAlignedAssigner")
    m = metrics("bbox_iou")
    o = ops_fns()
    for k in ("bbox2dist", "dist2bbox", "make_anchors", "TaskAlignedAssigner"):
        ns.setdefault(k, dep[k])
    ns.setdefault("bbox_iou", m["bbox_iou"])
    for k in ("xyxy2xywh", "xywh2xyxy"):
        ns.setdefault(k, o[k])
    return ns


class _FakeLogger:
    def warning(self, *a, **k):
        pass

    info = warning


def letterbox_cls():
    """The LetterBox transform from ultralytics/data/augment.py."""
    import cv2
    import numpy as np

    ns = _extract("ultralytics/data/augment.py", ("LetterBox",))
    ns["cv2"] = cv2
    ns["np"] = np
    return ns["LetterBox"]


def numpy_greedy_nms(boxes, scores, iou_thres):
    """Reference-free O(n^2) greedy NMS oracle (replaces torchvision.ops.nms)."""
    import numpy as np

    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for idx in order:
        if suppressed[idx]:
            continue
        keep.append(idx)
        x1 = np.maximum(boxes[idx, 0], boxes[:, 0])
        y1 = np.maximum(boxes[idx, 1], boxes[:, 1])
        x2 = np.minimum(boxes[idx, 2], boxes[:, 2])
        y2 = np.minimum(boxes[idx, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area_i = (boxes[idx, 2] - boxes[idx, 0]) * (boxes[idx, 3] - boxes[idx, 1])
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / (area_i + areas - inter + 1e-7)
        suppressed |= iou > iou_thres
        suppressed[idx] = True  # self
    return np.asarray(keep, dtype=np.int64)


def random_perspective_cls():
    """The RandomPerspective transform from ultralytics/data/augment.py with
    its segment2box dependency injected (for label-warp parity tests)."""
    import random

    import cv2
    import numpy as np

    ns = _extract("ultralytics/data/augment.py", ("RandomPerspective",))
    ops_ns = _extract("ultralytics/utils/ops.py", ("segment2box",))
    ns["cv2"] = cv2
    ns["np"] = np
    ns["random"] = random
    ns["segment2box"] = ops_ns["segment2box"]
    return ns["RandomPerspective"]
