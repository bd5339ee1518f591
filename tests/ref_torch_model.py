"""Torch-side golden model builder for parity tests.

AST-extracts the actual reference block implementations (Conv, C3k2_gai,
PMSFA, SCDown, MSCAAttention, ELA, SPPF, C2PSA, Detect, ...) from
/root/reference and assembles them into the same graph that our parser
produced — giving a runnable PyTorch oracle for parameter-count and forward
numerics parity without importing the (un-importable) reference package.
"""

from __future__ import annotations

import ast
import functools
import math
from pathlib import Path

import torch
import torch.nn as nn

REF = Path("/root/reference/ultralytics")


@functools.lru_cache(maxsize=None)
def _ns():
    """One shared namespace with every reference class we need."""
    import numpy as np
    import torch.nn.functional as F

    ns = {
        "torch": torch,
        "nn": nn,
        "F": F,
        "np": np,
        "math": math,
        "copy": __import__("copy"),
        "__name__": "ref_torch_model",
    }

    class _StripRelativeImports(ast.NodeTransformer):
        """Runtime relative imports inside extracted defs (e.g. AIFI's
        `from ...utils.torch_utils import TORCH_1_9`) can't resolve without
        the package; drop them — the imported names are predefined in ns."""

        def visit_ImportFrom(self, node):
            if node.level and node.level > 0:
                return ast.copy_location(ast.Pass(), node)
            return node

    def pull(relpath: str, names):
        src = (REF / relpath).read_text()
        tree = ast.parse(src)
        tree = ast.fix_missing_locations(_StripRelativeImports().visit(tree))
        pending = [
            node
            for node in tree.body
            if isinstance(node, (ast.FunctionDef, ast.ClassDef)) and node.name in names
        ]
        missing = set(names) - {n.name for n in pending}
        if missing:
            raise KeyError(f"{relpath}: {missing}")
        # classes may appear before their base classes in file order (the fork
        # inserted _gai classes mid-file); retry until the set settles
        while pending:
            progress = False
            errors = []
            for node in list(pending):
                try:
                    mod = ast.Module(body=[node], type_ignores=[])
                    exec(compile(mod, f"{relpath}:{node.name}", "exec"), ns)
                    pending.remove(node)
                    progress = True
                except NameError as e:
                    errors.append((node.name, e))
            if not progress:
                raise NameError(f"{relpath}: unresolved {errors}")

    pull("utils/tal.py", ["make_anchors", "dist2bbox", "dist2rbox"])
    ns["TORCH_1_10"] = True
    ns["TORCH_1_9"] = True
    from torch.nn.init import constant_, uniform_, xavier_uniform_

    ns["constant_"] = constant_
    ns["uniform_"] = uniform_
    ns["xavier_uniform_"] = xavier_uniform_
    pull(
        "nn/modules/utils.py",
        ["_get_clones", "bias_init_with_prob", "linear_init", "inverse_sigmoid",
         "multi_scale_deformable_attn_pytorch"],
    )
    pull("nn/modules/conv.py", ["autopad", "Conv", "DWConv", "Concat", "Pinwheel_shapedConv",
                                "LightConv", "RepConv", "GhostConv"])
    pull(
        "nn/modules/block.py",
        [
            "ResNetBlock",
            "ResNetLayer",
            "RepBottleneck",
            "RepCSP",
            "RepNCSPELAN4",
            "ELAN1",
            "AConv",
            "ADown",
            "SPPELAN",
            "CBLinear",
            "CBFuse",
            "DFL",
            "Bottleneck",
            "C2",
            "C2f",
            "C3",
            "C3k",
            "C3k2",
            "SPPF",
            "Attention",
            "PSABlock",
            "PSA",
            "C2PSA",
            "SCDown",
            "RepVGGDW",
            "HGStem",
            "HGBlock",
            "RepC3",
            "CIB",
            "C2fCIB",
            "MaxSigmoidAttnBlock",
            "C2fAttn",
            "ImagePoolingAttn",
            "ContrastiveHead",
            "BNContrastiveHead",
            "GhostBottleneck",
            "C3Ghost",
            "SPP",
            "PMSFA",
            "Bottleneck_gai",
            "C3k_gai",
            "C3k2_gai",
            "Proto",
        ],
    )
    pull("nn/Addmodules/MSCA.py", ["oneConv", "MSCAAttention"])
    pull("nn/Addmodules/ELA.py", ["ELA"])
    pull(
        "nn/modules/transformer.py",
        ["TransformerEncoderLayer", "AIFI", "MLP", "MSDeformAttn",
         "DeformableTransformerDecoderLayer", "DeformableTransformerDecoder"],
    )
    pull("nn/modules/head.py", ["Detect", "Segment", "Pose", "OBB", "Classify", "v10Detect", "WorldDetect", "RTDETRDecoder"])
    # RTDETRDecoder.forward does `from ultralytics.models.utils.ops import
    # get_cdn_group` at call time; provide it via a stub module tree
    import sys as _sys
    import types as _types

    _ops_ns = _extract_into(
        "models/utils/ops.py", ["get_cdn_group"],
        extra={"torch": torch, "nn": nn, "np": ns["np"], "math": math},
    )
    for name, mod in [
        ("ultralytics", _types.ModuleType("ultralytics")),
        ("ultralytics.models", _types.ModuleType("ultralytics.models")),
        ("ultralytics.models.utils", _types.ModuleType("ultralytics.models.utils")),
        ("ultralytics.models.utils.ops", _types.ModuleType("ultralytics.models.utils.ops")),
    ]:
        _sys.modules.setdefault(name, mod)
    _sys.modules["ultralytics.models.utils.ops"].get_cdn_group = _ops_ns["get_cdn_group"]
    return ns


def _extract_into(relpath, names, extra=None):
    """Standalone AST-extraction into a fresh namespace (for stub modules)."""
    import torch.nn.functional as F

    ns = dict(extra or {})
    ns.setdefault("F", F)
    ns["__name__"] = f"ref_extract.{relpath}"

    def pull(rel, wanted_names):
        src = (REF / rel).read_text()
        tree = ast.parse(src)
        wanted = [
            node
            for node in tree.body
            if isinstance(node, (ast.FunctionDef, ast.ClassDef)) and node.name in wanted_names
        ]
        for node in wanted:
            mod = ast.Module(body=[node], type_ignores=[])
            exec(compile(mod, f"{rel}:{node.name}", "exec"), ns)

    # get_cdn_group's box-space helpers live in utils/ops.py
    pull("utils/ops.py", ["xywh2xyxy", "xyxy2xywh", "empty_like"])
    pull(relpath, names)
    return ns


class RefGraph(nn.Module):
    """Torch graph walker equivalent to reference BaseModel._predict_once."""

    def __init__(self, spec, img_size=640):
        super().__init__()
        ns = _ns()
        self.spec = spec
        # yaml `activation:` override (reference tasks.py: Conv.default_act)
        act_map = {"relu": nn.ReLU(), "silu": nn.SiLU(), "lrelu": nn.LeakyReLU(0.1),
                   "gelu": nn.GELU(), "hardswish": nn.Hardswish()}
        ns["Conv"].default_act = act_map.get(getattr(spec, "act", "silu"), nn.SiLU())
        layers = []
        for L in spec.layers:
            m, a = L.module, list(L.args)
            if m in ("Conv", "DWConv", "SCDown", "SPPF", "C2PSA", "PSA", "C2", "C2f", "C3",
                     "C3k2", "C3k2_gai", "C2fCIB", "Bottleneck", "Pinwheel_shapedConv",
                     "RepNCSPELAN4", "ELAN1", "AConv", "ADown", "SPPELAN",
                     "GhostConv", "GhostBottleneck", "C3Ghost", "SPP"):
                args_t = [list(x) if isinstance(x, tuple) else x for x in a]
                mod = ns[m](L.c1, *args_t)
            elif m == "MSCAAttention":
                mod = ns[m](a[0])
            elif m == "ELA":
                mod = ns[m](a[0])
            elif m == "Identity":
                mod = nn.Identity()
            elif m == "CBLinear":
                mod = ns[m](L.c1, list(a[0]), *(a[1:]))
            elif m == "CBFuse":
                mod = ns[m](list(a[0]))
            elif m == "Upsample":
                mod = nn.Upsample(None, a[1], a[2])
            elif m == "MaxPool2d":
                mod = nn.MaxPool2d(a[0], a[1] if len(a) > 1 else None, a[2] if len(a) > 2 else 0)
            elif m == "ZeroPad2d":
                mod = nn.ZeroPad2d(list(a[0]))
            elif m == "ConvTranspose2d":
                mod = nn.ConvTranspose2d(L.c1, a[0], a[1], a[2], a[3] if len(a) > 3 else 0)
            elif m == "Concat":
                mod = ns["Concat"](1)
            elif m == "HGStem":
                mod = ns[m](L.c1, a[0], a[1])
            elif m == "HGBlock":
                mod = ns[m](L.c1, a[0], a[1], a[2], a[3], *(a[4:]))
            elif m == "RepC3":
                mod = ns[m](L.c1, a[0], a[1])
            elif m == "ResNetLayer":
                mod = ns[m](*a)  # yaml carries c1 explicitly
            elif m == "AIFI":
                mod = ns[m](L.c1, a[0], a[1] if len(a) > 1 else 8)
            elif m == "RTDETRDecoder":
                mod = ns[m](a[0], tuple(a[1]))
            elif m == "C2fAttn":
                mod = ns[m](L.c1, a[0], a[1], a[2], a[3])  # (c1, c2, n, ec, nh)
            elif m == "ImagePoolingAttn":
                mod = ns[m](a[0], tuple(a[1]))
            elif m == "WorldDetect":
                mod = ns[m](a[0], a[1], a[2], list(a[3]))
                mod.stride = torch.tensor([float(s) for s in spec.head_strides])
            elif m in ("Detect", "Segment", "Pose", "OBB", "v10Detect"):
                ns["Detect"].legacy = a[-1]
                if m == "v10Detect":
                    mod = ns[m](a[0], list(a[1]))
                elif m == "Detect":
                    mod = ns[m](a[0], list(a[1]))
                elif m == "Segment":
                    mod = ns[m](a[0], a[1], a[2], list(a[3]))
                elif m == "Pose":
                    mod = ns[m](a[0], tuple(a[1]), list(a[2]))
                else:  # OBB
                    mod = ns[m](a[0], a[1], list(a[2]))
                mod.stride = torch.tensor([float(s) for s in spec.head_strides])
            elif m == "Classify":
                mod = ns["Classify"](L.c1, a[0])
            else:
                raise NotImplementedError(m)
            if L.n > 1 and m not in ("Upsample", "Concat"):
                mod = nn.Sequential(*([mod] + [type(mod)(L.c1, *a) for _ in range(L.n - 1)]))
            mod.i, mod.f = L.i, list(L.f)
            layers.append(mod)
        self.model = nn.Sequential(*layers)
        self.save = list(spec.save)
        # reference DetectionModel.__init__ runs initialize_weights
        # (torch_utils.py:417: BN eps=1e-3, momentum=0.03) then bias_init
        # after stride calc — both shape training dynamics, so the oracle
        # must carry them for test_train_parity to be a fair comparison.
        for mm in self.model.modules():
            if isinstance(mm, nn.BatchNorm2d):
                mm.eps, mm.momentum = 1e-3, 0.03
        head = self.model[-1]
        if hasattr(head, "bias_init"):
            head.bias_init()
        self.eval()

    def forward(self, x, txt=None):
        """txt: (B, K, 512) text features for world graphs (the walk follows
        reference WorldModel.predict, tasks.py:630-664)."""
        y = {}
        out = x
        ori_txt = txt
        for mod in self.model:
            f = mod.f
            name = mod.__class__.__name__
            if len(f) == 1:
                inp = out if f[0] == -1 else y[f[0]]
            else:
                inp = [y[j] if j != -1 else out for j in f]
            if name == "RTDETRDecoder":
                out = mod(inp)
            elif name == "C2fAttn":
                out = mod(inp, txt)
            elif name == "ImagePoolingAttn":
                txt = mod(inp, txt)
                out = txt
            elif name == "WorldDetect":
                out = mod(inp, ori_txt)
            else:
                out = mod(inp)
            if mod.i in self.save:
                y[mod.i] = out
        return out

    def num_params(self):
        return sum(p.numel() for p in self.parameters())


def build_ref_model(yaml_path, scale="n", img_size=640):
    from bsyolo_tpu.nn.parser import load_model_yaml, parse_model_yaml

    d = load_model_yaml(yaml_path)
    spec = parse_model_yaml(d, scale=scale or d.get("scale", ""))
    return RefGraph(spec, img_size), spec
