"""ctypes bindings for the native runtime support library (native/).

Builds libbsyolo_native.so on first use (g++, cached next to the sources) and
exposes letterbox / NMS / scale_boxes with numpy interfaces. The Python
implementations remain the source of truth; the native library is the shared
pre/post-processing used by C++ serving clients (reference N3-N8 analog) and
an optional fast path for the host side of the predictor.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB = None


def build_native(force: bool = False) -> Path:
    so = NATIVE_DIR / "libbsyolo_native.so"
    src = NATIVE_DIR / "bsyolo_native.cpp"
    if force or not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-std=c++17", "-shared", "-o", str(so), str(src)],
            check=True,
            capture_output=True,
        )
    return so


def load() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        so = build_native()
        lib = ctypes.CDLL(str(so))
        lib.bsy_letterbox.restype = ctypes.c_float
        lib.bsy_nms.restype = ctypes.c_int
        _LIB = lib
    return _LIB


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def letterbox(img: np.ndarray, new_shape: Tuple[int, int] = (640, 640), pad_value: int = 114):
    """uint8 HWC letterbox via the native library. Returns (out, ratio)."""
    lib = load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, ch = img.shape
    out = np.empty((new_shape[0], new_shape[1], ch), np.uint8)
    r = lib.bsy_letterbox(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(h),
        ctypes.c_int(w),
        ctypes.c_int(ch),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(new_shape[0]),
        ctypes.c_int(new_shape[1]),
        ctypes.c_uint8(pad_value),
    )
    return out, float(r)


def nms(preds: np.ndarray, conf_thres: float = 0.25, iou_thres: float = 0.7, max_det: int = 300):
    """Decoded preds (n, 4+nc) -> (m, 6) detections via native greedy NMS."""
    lib = load()
    preds = np.ascontiguousarray(preds, dtype=np.float32)
    n, width = preds.shape
    nc = width - 4
    out = np.zeros((max_det, 6), np.float32)
    m = lib.bsy_nms(
        preds.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(n),
        ctypes.c_int(nc),
        ctypes.c_float(conf_thres),
        ctypes.c_float(iou_thres),
        ctypes.c_int(max_det),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out[:m]


def scale_boxes(boxes: np.ndarray, lb_shape: Tuple[int, int], orig_shape: Tuple[int, int]):
    """In-place rescale of (n, 6) letterboxed detections to original coords."""
    lib = load()
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    lib.bsy_scale_boxes(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(len(boxes)),
        ctypes.c_int(lb_shape[0]),
        ctypes.c_int(lb_shape[1]),
        ctypes.c_int(orig_shape[0]),
        ctypes.c_int(orig_shape[1]),
    )
    return boxes
