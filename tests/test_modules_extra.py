"""Parity tests for the experimental / Addmodules block zoo.

Each test builds the reference torch block (AST-extracted from
/root/reference so the actual fork code runs), converts its weights with the
generic converter, and checks forward numerics block-by-block.
"""

import ast
import math
import sys
import types
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax.numpy as jnp

REF = Path("/root/reference/ultralytics")
SYSREF = Path("/root/reference/sys/ultralytics")

RTOL, ATOL = 1e-4, 3e-4


def _pull(ns: dict, root: Path, relpath: str, names):
    """Exec selected top-level defs (dependency-order retry) into ns."""
    import torch  # noqa

    src = (root / relpath).read_text()
    tree = ast.parse(src)
    pending = [
        n for n in tree.body
        if isinstance(n, (ast.FunctionDef, ast.ClassDef)) and n.name in names
    ]
    missing = set(names) - {n.name for n in pending}
    if missing:
        raise KeyError(f"{relpath}: {missing}")
    while pending:
        progress = False
        for node in list(pending):
            try:
                mod = ast.Module(body=[node], type_ignores=[])
                exec(compile(mod, f"{relpath}:{node.name}", "exec"), ns)
                pending.remove(node)
                progress = True
            except NameError:
                pass
        if not progress:
            raise NameError(f"{relpath}: unresolved {[n.name for n in pending]}")


def _base_ns():
    import functools
    import warnings

    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    from einops import rearrange

    from typing import List, Optional, Tuple

    return {
        "torch": torch, "nn": nn, "F": F, "np": np, "math": math,
        "warnings": warnings, "functools": functools, "rearrange": rearrange,
        "Tuple": Tuple, "List": List, "Optional": Optional,
        "__name__": "test_modules_extra.oracle",
    }


@pytest.fixture(scope="module")
def main_ns():
    ns = _base_ns()
    _pull(ns, REF, "nn/modules/conv.py",
          ["autopad", "Conv", "DWConv", "GSConv", "DWConvTranspose2d"])
    _pull(ns, REF, "nn/modules/transformer.py", ["TransformerLayer", "TransformerBlock"])
    _pull(ns, REF, "nn/modules/block.py",
          ["SimConv", "SimSPPF", "SPPFCSPC", "BottleneckCSP", "Bottleneck",
           "C2f", "C3", "C3k", "C3TR",
           "patch_divide", "patch_reverse", "PreNorm", "dwconv", "ConvFFN",
           "Attention_LRSA", "LRSA", "Bottleneck_LRSA", "C3k_LRSA", "C3k2_LRSA"])
    _pull(ns, REF, "nn/Addmodules/FocalModulation.py", ["FocalModulation"])
    return ns


@pytest.fixture(scope="module")
def outlook_ns(main_ns):
    ns = dict(main_ns)
    _pull(ns, REF, "nn/Addmodules/OutlookAttention.py",
          ["OutlookAttention", "Bottleneck_OAtention", "C2f_OAtention",
           "C3K2_OAtention", "C3k", "C3", "C2f", "Bottleneck"])
    return ns


@pytest.fixture(scope="module")
def moga_ns(outlook_ns):
    ns = dict(outlook_ns)
    _pull(ns, REF, "nn/Addmodules/Moganet.py",
          ["ChannelAggregationFFN", "MultiOrderDWConv", "MultiOrderGatedAggregation",
           "Bottleneck_MultiOGA", "C2f_MultiOGA", "C3K2_MultiOGA", "C3k"])
    return ns


@pytest.fixture(scope="module")
def sys_ns():
    import torch.nn as nn

    ns = _base_ns()
    ns["DropPath"] = lambda p=0.0: nn.Identity()  # timm stub; wrappers use p=0
    _pull(ns, SYSREF, "nn/modules/conv.py", ["autopad", "Conv", "DWConv"])
    _pull(ns, SYSREF, "nn/Addmodules/CoordAtt.py", ["h_sigmoid", "h_swish", "CoordAtt"])
    _pull(ns, SYSREF, "nn/modules/block.py",
          ["Bottleneck", "C2f", "C3", "C3k", "C3k2",
           "IEL", "Bottleneck_IEL", "C3k_IEL", "C3k2_IEL",
           "DWConv2d", "MaSA", "MaSAd", "FeedForwardNetwork", "RelPos2d",
           "RetBlock", "C3k_RetBlock", "C3k2_RetBlock"])
    return ns


@pytest.fixture(scope="module")
def scconv_ns(sys_ns):
    ns = dict(sys_ns)
    # strip the debug print()s from GroupBatchnorm2d before exec
    src = (SYSREF / "nn/Addmodules/SCConv.py").read_text().replace("print(", "# print(")
    tree = ast.parse(src)
    wanted = {"GroupBatchnorm2d", "SRU", "CRU", "SCConv", "Bottleneck_SCConv",
              "C2f_SCConv", "C3k2_SCConv"}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)) and node.name in wanted:
            exec(compile(ast.Module(body=[node], type_ignores=[]), "SCConv.py", "exec"), ns)
    return ns


@pytest.fixture(scope="module")
def wavelet_ns():
    """WTConv oracle with a stub pywt (not installed) providing db1/Haar."""
    s = 1.0 / math.sqrt(2.0)

    class _W:
        dec_lo = [s, s]
        dec_hi = [-s, s]
        rec_lo = [s, s]
        rec_hi = [s, -s]

    pywt = types.ModuleType("pywt")
    pywt.Wavelet = lambda name: _W()
    ns = _base_ns()
    ns["pywt"] = pywt
    ns["wavelet"] = types.SimpleNamespace()
    _pull(ns, REF, "nn/Addmodules/wavelet.py",
          ["create_wavelet_filter", "wavelet_transform", "inverse_wavelet_transform"])
    for k in ("create_wavelet_filter", "wavelet_transform", "inverse_wavelet_transform"):
        setattr(ns["wavelet"], k, ns[k])
    _pull(ns, REF, "nn/Addmodules/WTConv.py", ["_ScaleModule", "WTConv2d"])
    return ns


@pytest.fixture(scope="module")
def condconv_ns():
    import torch
    from torch.nn.modules.conv import _ConvNd
    from torch.nn.modules.utils import _pair
    from torch.nn.parameter import Parameter

    ns = _base_ns()
    ns.update({"_ConvNd": _ConvNd, "_pair": _pair, "Parameter": Parameter})
    _pull(ns, REF, "nn/Addmodules/condconv.py", ["_routing", "CondConv2D"])
    return ns


def _compare(torch_mod, flax_mod, x_nhwc, drop=(), rtol=RTOL, atol=ATOL):
    """Convert torch weights into the flax module; assert forward parity."""
    import jax
    import torch

    from bsyolo_tpu.utils.torch_weights import convert_state_dict

    torch_mod.eval()
    # mirror reference initialize_weights (torch_utils.py:417-427): every BN
    # in a built model runs with eps 1e-3 / momentum 0.03
    for m in torch_mod.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.eps, m.momentum = 1e-3, 0.03
    x = np.asarray(x_nhwc, np.float32)
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    with torch.no_grad():
        want = torch_mod(xt).numpy()

    variables = flax_mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    sd = {k: v.detach().numpy() for k, v in torch_mod.state_dict().items()
          if not any(d in k for d in drop)}
    variables, report = convert_state_dict(sd, variables, strict=True)
    got = np.asarray(flax_mod.apply(variables, jnp.asarray(x), train=False))
    got = got.transpose(0, 3, 1, 2)
    assert got.shape == want.shape, f"{got.shape} vs {want.shape}"
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)
    # param-count parity (trainable params only)
    n_torch = sum(p.numel() for p in torch_mod.parameters() if p.requires_grad)
    n_flax = sum(v.size for v in jax.tree_util.tree_leaves(variables["params"]))
    assert n_flax == n_torch


def _rng(shape, seed=0):
    return np.random.default_rng(seed).uniform(-1, 1, size=shape).astype(np.float32)


class TestMainTreeBlocks:
    def test_simsppf(self, main_ns):
        from bsyolo_tpu.nn.modules_extra import SimSPPF

        _compare(main_ns["SimSPPF"](32, 64, 5), SimSPPF(64, 5), _rng((1, 16, 16, 32)))

    def test_sppfcspc(self, main_ns):
        from bsyolo_tpu.nn.modules_extra import SPPFCSPC

        _compare(main_ns["SPPFCSPC"](32, 64), SPPFCSPC(64), _rng((1, 16, 16, 32)))

    def test_bottleneck_csp(self, main_ns):
        from bsyolo_tpu.nn.modules_extra import BottleneckCSP

        _compare(main_ns["BottleneckCSP"](32, 32, n=2), BottleneckCSP(32, 2),
                 _rng((1, 16, 16, 32)))

    def test_c3tr(self, main_ns):
        from bsyolo_tpu.nn.modules_extra import C3TR

        _compare(main_ns["C3TR"](32, 32, n=2), C3TR(32, 2), _rng((1, 8, 8, 32)))

    @pytest.mark.parametrize("k,s", [(1, 1), (3, 2)])
    def test_gsconv(self, main_ns, k, s):
        from bsyolo_tpu.nn.modules_extra import GSConv

        _compare(main_ns["GSConv"](32, 64, k, s), GSConv(64, k, s), _rng((1, 16, 16, 32)))

    def test_dwconvtranspose2d(self, main_ns):
        from bsyolo_tpu.nn.modules_extra import DWConvTranspose2dLayer

        _compare(main_ns["DWConvTranspose2d"](32, 16, 2, 2),
                 DWConvTranspose2dLayer(16, 2, 2), _rng((1, 8, 8, 32)))

    def test_focal_modulation(self, main_ns):
        from bsyolo_tpu.nn.modules_extra import FocalModulation

        _compare(main_ns["FocalModulation"](32), FocalModulation(32), _rng((1, 16, 16, 32)))

    def test_lrsa_standalone(self, main_ns):
        from bsyolo_tpu.nn.modules_extra import LRSA

        _compare(main_ns["LRSA"](32), LRSA(32), _rng((1, 32, 32, 32)))

    def test_c3k2_lrsa(self, main_ns):
        from bsyolo_tpu.nn.modules_extra import C3k2_LRSA

        _compare(main_ns["C3k2_LRSA"](32, 32, n=1), C3k2_LRSA(32, 1, True),
                 _rng((1, 16, 16, 32)))


class TestOutlookMoga:
    def test_outlook_attention(self, outlook_ns):
        from bsyolo_tpu.nn.modules_extra import OutlookAttention

        _compare(outlook_ns["OutlookAttention"](32, 4), OutlookAttention(32, 4),
                 _rng((1, 12, 12, 32)))

    def test_c3k2_oatention(self, outlook_ns):
        from bsyolo_tpu.nn.modules_extra import C3K2_OAtention

        _compare(outlook_ns["C3K2_OAtention"](32, 32, n=1), C3K2_OAtention(32, 1, True),
                 _rng((1, 12, 12, 32)))

    def test_moga_standalone(self, moga_ns):
        from bsyolo_tpu.nn.modules_extra import MultiOrderGatedAggregation

        _compare(moga_ns["MultiOrderGatedAggregation"](32), MultiOrderGatedAggregation(32),
                 _rng((1, 16, 16, 32)))

    def test_c3k2_multioga(self, moga_ns):
        from bsyolo_tpu.nn.modules_extra import C3K2_MultiOGA

        _compare(moga_ns["C3K2_MultiOGA"](32, 32, n=1), C3K2_MultiOGA(32, 1, True),
                 _rng((1, 16, 16, 32)))


class TestSysBlocks:
    def test_coordatt(self, sys_ns):
        from bsyolo_tpu.nn.modules_extra import CoordAtt

        _compare(sys_ns["CoordAtt"](32, 32), CoordAtt(32), _rng((1, 16, 16, 32)))

    def test_scconv_standalone(self, scconv_ns):
        from bsyolo_tpu.nn.modules_extra import SCConv

        _compare(scconv_ns["SCConv"](32), SCConv(), _rng((1, 16, 16, 32)))

    def test_c2f_scconv(self, scconv_ns):
        from bsyolo_tpu.nn.modules_extra import C2f_SCConv

        _compare(scconv_ns["C2f_SCConv"](32, 32, n=1), C2f_SCConv(32, 1),
                 _rng((1, 16, 16, 32)))

    def test_c3k2_scconv_c3k(self, scconv_ns):
        from bsyolo_tpu.nn.modules_extra import C3k2_SCConv

        _compare(scconv_ns["C3k2_SCConv"](64, 64, n=1, c3k=True),
                 C3k2_SCConv(64, 1, True, c3k=True), _rng((1, 16, 16, 64)))

    def test_c3k2_scconv_default_broken_in_reference(self, scconv_ns):
        """The reference's non-c3k default crashes (inner e=0.5 feeds
        SCConv(op_channel=c) a c/2-channel tensor); ours runs with e=1.0."""
        import torch

        from bsyolo_tpu.nn.modules_extra import C3k2_SCConv
        import jax

        m = scconv_ns["C3k2_SCConv"](32, 32, n=1, c3k=False)
        m.eval()
        with pytest.raises(RuntimeError):
            with torch.no_grad():
                m(torch.zeros(1, 32, 8, 8))
        ours = C3k2_SCConv(32, 1)
        v = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 32)), train=False)
        y = ours.apply(v, jnp.zeros((1, 16, 16, 32)), train=False)
        assert y.shape == (1, 16, 16, 32)

    def test_c3k2_iel(self, sys_ns):
        from bsyolo_tpu.nn.modules_extra import C3k2_IEL

        _compare(sys_ns["C3k2_IEL"](32, 32, n=1), C3k2_IEL(32, 1, True), _rng((1, 16, 16, 32)))

    def test_iel_standalone(self, sys_ns):
        from bsyolo_tpu.nn.modules_extra import IEL

        _compare(sys_ns["IEL"](32), IEL(32), _rng((1, 16, 16, 32)))

    @pytest.mark.parametrize("retention", ["chunk", "whole"])
    def test_c3k2_retblock(self, sys_ns, retention):
        from bsyolo_tpu.nn.modules_extra import C3k2_RetBlock

        _compare(sys_ns["C3k2_RetBlock"](32, 32, n=1, retention=retention, num_heads=8),
                 C3k2_RetBlock(32, 1, True, retention=retention, num_heads=8),
                 _rng((1, 12, 12, 32)), drop=("Relpos",))

    def test_c3k2_retblock_c3k(self, sys_ns):
        from bsyolo_tpu.nn.modules_extra import C3k2_RetBlock

        _compare(sys_ns["C3k2_RetBlock"](32, 32, n=1, retention="chunk", num_heads=8,
                                         c3k=True),
                 C3k2_RetBlock(32, 1, True, retention="chunk", num_heads=8, c3k=True),
                 _rng((1, 12, 12, 32)), drop=("Relpos",))


class TestAddmodulesExports:
    @pytest.mark.parametrize("levels,size", [(1, 16), (2, 18)])
    def test_wtconv2d(self, wavelet_ns, levels, size):
        from bsyolo_tpu.nn.modules_extra import WTConv2d

        _compare(wavelet_ns["WTConv2d"](32, 32, 5, wt_levels=levels),
                 WTConv2d(32, 5, wt_levels=levels), _rng((1, size, size, 32)),
                 drop=("wt_filter", "iwt_filter"))

    def test_wtconv2d_stride(self, wavelet_ns):
        from bsyolo_tpu.nn.modules_extra import WTConv2d

        _compare(wavelet_ns["WTConv2d"](16, 16, 5, stride=2),
                 WTConv2d(16, 5, stride=2), _rng((1, 16, 16, 16)),
                 drop=("wt_filter", "iwt_filter"))

    def test_condconv2d(self, condconv_ns):
        from bsyolo_tpu.nn.modules_extra import CondConv2D

        _compare(condconv_ns["CondConv2D"](32, 16, 3, stride=2, padding=1, num_experts=3),
                 CondConv2D(16, 3, stride=2, padding=1, num_experts=3),
                 _rng((2, 16, 16, 32)))


class TestGraphIntegration:
    def test_yaml_graph_with_extra_blocks(self, tmp_path):
        """A detect graph mixing the experimental blocks builds and runs."""
        import jax

        from bsyolo_tpu.nn.model import build_model
        from bsyolo_tpu.nn.parser import load_model_yaml, parse_model_yaml

        y = tmp_path / "exp.yaml"
        y.write_text(
            """
nc: 4
backbone:
  - [-1, 1, Conv, [16, 3, 2]]
  - [-1, 1, GSConv, [32, 3, 2]]
  - [-1, 1, C3K2_OAtention, [32, False]]
  - [-1, 1, CoordAtt, [32]]
  - [-1, 1, Conv, [64, 3, 2]]
  - [-1, 1, C3k2_IEL, [64, False]]
  - [-1, 1, FocalModulation, []]
  - [-1, 1, Conv, [128, 3, 2]]
  - [-1, 1, C3K2_MultiOGA, [128, False]]
  - [-1, 1, Conv, [256, 3, 2]]
  - [-1, 1, SimSPPF, [256, 5]]
head:
  - [[6, 8, 10], 1, Detect, [nc]]
"""
        )
        spec = parse_model_yaml(load_model_yaml(y), verbose=False)
        model, variables = build_model(spec, img_size=64)
        feats = jax.jit(lambda v, x: model.apply(v, x, train=False))(
            variables, jnp.zeros((1, 64, 64, 3))
        )
        assert len(feats) == 3


class TestGradFlow:
    @pytest.mark.parametrize("name", [
        "C3k2_LRSA", "C3K2_OAtention", "C3K2_MultiOGA", "C3k2_IEL",
        "C3k2_RetBlock", "C2f_SCConv", "FocalModulation", "WTConv2d",
        "CondConv2D", "CoordAtt", "SPPFCSPC", "C3TR",
    ])
    def test_gradients_finite_and_nonzero(self, name):
        """Every new block trains: finite, non-zero grads through train mode."""
        import jax

        from bsyolo_tpu.nn import modules_extra as X

        mods = {
            "C3k2_LRSA": lambda: X.C3k2_LRSA(32, 1, True),
            "C3K2_OAtention": lambda: X.C3K2_OAtention(32, 1, True),
            "C3K2_MultiOGA": lambda: X.C3K2_MultiOGA(32, 1, True),
            "C3k2_IEL": lambda: X.C3k2_IEL(32, 1, True),
            "C3k2_RetBlock": lambda: X.C3k2_RetBlock(32, 1, True, num_heads=8),
            "C2f_SCConv": lambda: X.C2f_SCConv(32, 1),
            "FocalModulation": lambda: X.FocalModulation(32),
            "WTConv2d": lambda: X.WTConv2d(32, wt_levels=2),
            "CondConv2D": lambda: X.CondConv2D(16, 3, padding=1),
            "CoordAtt": lambda: X.CoordAtt(32),
            "SPPFCSPC": lambda: X.SPPFCSPC(32),
            "C3TR": lambda: X.C3TR(32, 1),
        }
        m = mods[name]()
        x = jnp.asarray(_rng((1, 16, 16, 32), seed=1))
        variables = m.init(jax.random.PRNGKey(0), x, train=False)

        def loss(params):
            out = m.apply({"params": params, **{k: v for k, v in variables.items()
                                                if k != "params"}},
                          x, train=True,
                          mutable=[k for k in variables if k != "params"])[0]
            return jnp.sum(out ** 2)

        g = jax.jit(jax.grad(loss))(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(t))) for t in leaves)
        total = sum(float(jnp.sum(jnp.abs(t))) for t in leaves)
        assert total > 0


@pytest.mark.slow
class TestExperimentalGraphTraining:
    def test_train_run_with_exotic_blocks(self, tmp_path):
        """A detect graph mixing experimental blocks trains to a real mAP on
        the synthetic 2-class set (same bar as the stock tiny graph)."""
        from test_e2e_train import make_synthetic_dataset

        from bsyolo_tpu.engine.trainer import DetectionTrainer

        graph = tmp_path / "exotic.yaml"
        graph.write_text(
            """
nc: 2
backbone:
  - [-1, 1, Conv, [16, 3, 2]]
  - [-1, 1, GSConv, [32, 3, 2]]
  - [-1, 1, C3K2_OAtention, [32, False]]
  - [-1, 1, CoordAtt, [32]]
  - [-1, 1, Conv, [64, 3, 2]]
  - [-1, 1, C3k2_IEL, [64, False]]
  - [-1, 1, Conv, [128, 3, 2]]
  - [-1, 1, C3K2_MultiOGA, [128, False]]
  - [-1, 1, SimSPPF, [128, 5]]
head:
  - [[5, 7, 8], 1, Detect, [nc]]
"""
        )
        data_yaml = make_synthetic_dataset(tmp_path / "ds")
        trainer = DetectionTrainer(
            overrides={
                "model": str(graph), "data": str(data_yaml), "epochs": 20,
                "batch": 8, "imgsz": 96, "optimizer": "SGD", "lr0": 0.02,
                "warmup_epochs": 1.0, "close_mosaic": 8,
                "project": str(tmp_path / "runs"), "name": "x", "max_gt": 32,
                "amp": False, "patience": 100, "nbs": 8,
            }
        )
        metrics = trainer.train()
        assert metrics is not None
        assert metrics.box.map50 > 0.4, f"mAP50 too low: {metrics.box.map50}"
