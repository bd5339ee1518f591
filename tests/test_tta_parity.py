"""TTA merge-math parity vs the reference's actual code.

Extracts DetectionModel._descale_pred / _clip_augmented (reference
nn/tasks.py:372-392) via AST and checks our predictor's de-scale /
de-flip / tail-clip arithmetic produces identical merged predictions on
random decoded tensors.
"""

import ast
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/ultralytics/nn/tasks.py")


def _extract_methods():
    import torch

    tree = ast.parse(REF.read_text())
    cls = next(n for n in tree.body if isinstance(n, ast.ClassDef) and n.name == "DetectionModel")
    fns = [n for n in cls.body if isinstance(n, ast.FunctionDef)
           and n.name in ("_descale_pred", "_clip_augmented")]
    for f in fns:
        f.decorator_list = []  # strip @staticmethod; call with explicit args
    mod = ast.Module(body=fns, type_ignores=[])
    ast.fix_missing_locations(mod)
    ns = {"torch": torch}
    exec(compile(mod, str(REF), "exec"), ns)
    return ns["_descale_pred"], ns["_clip_augmented"], torch


class _StubHead:
    nl = 3


class _StubModel:
    def __init__(self):
        self._head = _StubHead()

    def __getitem__(self, i):
        return self._head


class _StubSelf:
    model = _StubModel()


@pytest.mark.parametrize("imgsz", [64, 96])
def test_tta_descale_and_clip_match_reference(imgsz):
    descale, clip, torch = _extract_methods()
    rng = np.random.default_rng(0)
    nc, b = 3, 2
    # anchors per level at stride 8/16/32 for a square imgsz input
    counts = [(imgsz // s) ** 2 for s in (8, 16, 32)]
    A = sum(counts)

    # three decoded outputs in OUR layout (B, A, 4+nc), xywh pixels of the
    # SCALED image + per-class scores
    scales = (1.0, 0.83, 0.67)
    flips = (None, 3, None)
    # per-pass anchor counts follow each pass's padded input size
    import math
    pass_preds = []
    pass_A = []
    for s in scales:
        sz = math.ceil(imgsz * s / 32) * 32 if s != 1.0 else imgsz
        cts = [(sz // st) ** 2 for st in (8, 16, 32)]
        pass_A.append(sum(cts))
        p = rng.uniform(0, imgsz, size=(b, sum(cts), 4 + nc)).astype(np.float32)
        p[..., 4:] = rng.uniform(0, 1, size=(b, sum(cts), nc))
        pass_preds.append(p)

    # --- reference path: (B, 4+nc, A) channel-first, in-place descale ---
    ref_y = []
    for p, s, f in zip(pass_preds, scales, flips):
        t = torch.tensor(p.copy()).permute(0, 2, 1)  # (B, 4+nc, A)
        # reference descale operates on dim=1 split
        t = descale(t, f, s, (imgsz, imgsz))
        ref_y.append(t)
    ref_y = clip(_StubSelf(), ref_y)
    ref_merged = torch.cat(ref_y, -1).permute(0, 2, 1).numpy()  # (B, A', 4+nc)

    # --- our path (predictor.py TTA math, anchors-first) ---
    outs = []
    for p, s, f in zip(pass_preds, scales, flips):
        q = p.copy()
        q[..., :4] /= s
        if f == 3:
            q[..., 0] = imgsz - q[..., 0]
        outs.append(q)
    nl = 3
    g = sum(4 ** i for i in range(nl))
    outs[0] = outs[0][:, : -(outs[0].shape[1] // g)]
    outs[-1] = outs[-1][:, (outs[-1].shape[1] // g) * 4 ** (nl - 1):]
    ours = np.concatenate(outs, axis=1)

    assert ours.shape == ref_merged.shape, (ours.shape, ref_merged.shape)
    np.testing.assert_allclose(ours, ref_merged, rtol=1e-6, atol=1e-5)


def test_tta_clip_matches_reference_for_p6():
    """4-level (P6, stride 64) tail-clip parity: predictor pads scaled passes
    to max(strides), keeping the 4^i per-level anchor ratio clip assumes."""
    descale, clip, torch = _extract_methods()
    import math

    imgsz, nc, b = 128, 2, 1
    strides = (8, 16, 32, 64)
    nl = len(strides)
    rng = np.random.default_rng(1)
    scales = (1.0, 0.83, 0.67)
    flips = (None, 3, None)
    gs = max(strides)
    pass_preds = []
    for s in scales:
        sz = math.ceil(imgsz * s / gs) * gs if s != 1.0 else imgsz
        A = sum((sz // st) ** 2 for st in strides)
        p = rng.uniform(0, imgsz, size=(b, A, 4 + nc)).astype(np.float32)
        pass_preds.append(p)

    class _H:  # stub head with nl=4
        nl = 4

    class _M:
        def __getitem__(self, i):
            return _H()

    class _S:
        model = _M()

    ref_y = []
    for p, s, f in zip(pass_preds, scales, flips):
        t = descale(torch.tensor(p.copy()).permute(0, 2, 1), f, s, (imgsz, imgsz))
        ref_y.append(t)
    ref = torch.cat(clip(_S(), ref_y), -1).permute(0, 2, 1).numpy()

    outs = []
    for p, s, f in zip(pass_preds, scales, flips):
        q = p.copy()
        q[..., :4] /= s
        if f == 3:
            q[..., 0] = imgsz - q[..., 0]
        outs.append(q)
    g = sum(4 ** i for i in range(nl))
    outs[0] = outs[0][:, : -(outs[0].shape[1] // g)]
    outs[-1] = outs[-1][:, (outs[-1].shape[1] // g) * 4 ** (nl - 1):]
    ours = np.concatenate(outs, axis=1)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-5)
