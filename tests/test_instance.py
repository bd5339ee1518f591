"""Bboxes/Instances geometry containers vs the AST-extracted reference."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))


def _ref_ns():
    """Extract reference Bboxes/Instances (torch-free numpy classes)."""
    import ast

    src = Path("/root/reference/ultralytics/utils/instance.py").read_text()
    tree = ast.parse(src)
    ns = {"np": np}
    from collections import abc
    from itertools import repeat
    from numbers import Number
    from typing import List

    ns.update({"abc": abc, "repeat": repeat, "Number": Number, "List": List})

    def resample_segments(segments, n=1000):
        from bsyolo_tpu.utils.instance import _resample_segments

        if len(segments) == 0:
            return segments
        return list(_resample_segments(np.stack(segments), n))

    ns["resample_segments"] = resample_segments
    ns["_formats"] = ["xyxy", "xywh", "ltwh"]
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)) and node.name in (
            "_ntuple", "Bboxes", "Instances",
        ):
            exec(compile(ast.Module(body=[node], type_ignores=[]), "instance.py", "exec"), ns)
    # module-level to_2tuple/to_4tuple
    exec("to_2tuple = _ntuple(2)\nto_4tuple = _ntuple(4)", ns)
    return ns


def _rand_instances(cls, rng, normalized=False):
    boxes = np.sort(rng.uniform(0, 100, (5, 4)).astype(np.float32), axis=-1)
    segs = rng.uniform(0, 100, (5, 8, 2)).astype(np.float32)
    kpts = rng.uniform(0, 100, (5, 3, 3)).astype(np.float32)
    return cls(boxes.copy(), segs.copy(), kpts.copy(), bbox_format="xyxy",
               normalized=normalized)


class TestInstancesParity:
    @pytest.mark.parametrize("op", ["scale", "add_padding", "fliplr", "flipud", "clip"])
    def test_geometry_ops_match_reference(self, op):
        from bsyolo_tpu.utils.instance import Instances

        ns = _ref_ns()
        rng = np.random.default_rng(0)
        mine = _rand_instances(Instances, rng)
        rng = np.random.default_rng(0)
        ref = _rand_instances(ns["Instances"], rng)
        if op == "scale":
            mine.scale(0.5, 2.0)
            ref.scale(0.5, 2.0)
        elif op == "add_padding":
            mine.add_padding(7, 11)
            ref.add_padding(7, 11)
        elif op == "fliplr":
            mine.fliplr(100)
            ref.fliplr(100)
        elif op == "flipud":
            mine.flipud(100)
            ref.flipud(100)
        elif op == "clip":
            mine.scale(2.0, 2.0)
            ref.scale(2.0, 2.0)
            mine.clip(120, 120)
            ref.clip(120, 120)
        np.testing.assert_allclose(mine.bboxes, ref.bboxes, rtol=1e-6)
        np.testing.assert_allclose(mine.segments, ref.segments, rtol=1e-6)
        np.testing.assert_allclose(mine.keypoints, ref.keypoints, rtol=1e-6)

    def test_format_roundtrip(self):
        from bsyolo_tpu.utils.instance import Bboxes

        b = Bboxes(np.asarray([[10.0, 20.0, 50.0, 80.0]]), "xyxy")
        b.convert("xywh")
        np.testing.assert_allclose(b.bboxes, [[30, 50, 40, 60]])
        b.convert("ltwh")
        np.testing.assert_allclose(b.bboxes, [[10, 20, 40, 60]])
        b.convert("xyxy")
        np.testing.assert_allclose(b.bboxes, [[10, 20, 50, 80]])
        np.testing.assert_allclose(b.areas(), [2400])

    def test_remove_zero_area_and_concat(self):
        from bsyolo_tpu.utils.instance import Instances

        boxes = np.asarray([[0, 0, 10, 10], [5, 5, 5, 9]], np.float32)  # 2nd zero-w
        inst = Instances(boxes, bbox_format="xyxy", normalized=False)
        good = inst.remove_zero_area_boxes()
        assert good.tolist() == [True, False] and len(inst) == 1
        cat = Instances.concatenate([inst, inst])
        assert len(cat) == 2

    def test_normalize_denormalize_roundtrip(self):
        from bsyolo_tpu.utils.instance import Instances

        rng = np.random.default_rng(1)
        inst = _rand_instances(Instances, rng, normalized=False)
        orig = inst.bboxes.copy()
        inst.normalize(200, 100)
        assert inst.normalized and inst.bboxes.max() <= 1.0
        inst.denormalize(200, 100)
        np.testing.assert_allclose(inst.bboxes, orig, rtol=1e-5)
