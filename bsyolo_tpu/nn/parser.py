"""YAML model-config parser (reference: ultralytics/nn/tasks.py:940 parse_model).

Accepts the exact reference YAML schema (backbone/head lists of
``[from, repeats, module, args]`` with ``scales:`` compound scaling) so the
fork's model files (cfg/models/11/yolo11.yaml etc.) load unchanged. Produces a
static, hashable ``ModelSpec`` consumed by the flax graph model — all channel
arithmetic, depth/width scaling, and stride propagation happen here at parse
time so the compiled graph sees only static shapes.
"""

from __future__ import annotations

import ast
import math
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Optional, Tuple

import yaml


def make_divisible(x: float, divisor: int = 8) -> int:
    """Round channels up to the nearest multiple (reference utils/checks.py)."""
    return math.ceil(x / divisor) * divisor


@dataclass(frozen=True)
class LayerSpec:
    i: int  # layer index
    f: Tuple[int, ...]  # from indices (resolved, absolute; -1 kept relative)
    n: int  # repeats (after depth gain)
    module: str  # module name, e.g. "Conv", "C3k2_gai"
    args: Tuple[Any, ...]  # resolved module args (excluding c1)
    c1: int  # input channels
    c2: int  # output channels
    stride: int  # cumulative downsample factor of this layer's output


@dataclass(frozen=True)
class ModelSpec:
    layers: Tuple[LayerSpec, ...]
    save: Tuple[int, ...]  # layer indices whose outputs are reused
    nc: int
    scale: str
    task: str
    yaml_name: str = ""
    kpt_shape: Tuple[int, int] = (17, 3)
    names: Tuple[str, ...] = ()
    act: str = "silu"  # graph-wide Conv activation (`activation:` yaml key)
    dropout: float = 0.0  # Classify-head dropout (cfg `dropout:`, classify train only)

    @property
    def head(self) -> LayerSpec:
        return self.layers[-1]

    @property
    def head_strides(self) -> Tuple[int, ...]:
        idx = self.head.f
        return tuple(self.layers[j].stride for j in idx)

    @property
    def head_ch(self) -> Tuple[int, ...]:
        return tuple(self.layers[j].c2 for j in self.head.f)

    @property
    def reg_max(self) -> int:
        """DFL bin count of the detect head (NAS NDFL counts 16 bin edges =
        17 bins; every YOLO Detect-family head uses 16)."""
        return 17 if self.head.module == "NASDetect" else 16


# Modules following the reference "conv-ish" channel rule (tasks.py:972-1046):
# c1 = ch[f], c2 = make_divisible(min(args[0], max_channels) * width, 8)
_CONVLIKE = {
    "Conv",
    "DWConv",
    "ConvTranspose",
    "Pinwheel_shapedConv",
    "Bottleneck",
    "SPP",
    "SPPF",
    "C2PSA",
    "C2fPSA",
    "C1",
    "C2",
    "C2f",
    "C3",
    "C3x",
    "C3k2",
    "C3k2_gai",
    "PSA",
    "SCDown",
    "C2fCIB",
    "RepC3",
    "Focus",
    "GhostConv",
    "GhostBottleneck",
    "C3Ghost",
    "RepNCSPELAN4",
    "ELAN1",
    "AConv",
    "ADown",
    "SPPELAN",
    "ConvTranspose2d",
    # experimental zoo (reference tasks.py:972-1046 + sys/ copy's parser)
    "SimSPPF",
    "SPPFCSPC",
    "BottleneckCSP",
    "C3TR",
    "GSConv",
    "DWConvTranspose2d",
    "C3k2_LRSA",
    "C3K2_OAtention",
    "C3K2_MultiOGA",  # reference registers it incompletely (repeat-set only,
    # tasks.py:1041) making it unusable from YAML there; full rule here
    "CoordAtt",
    "C2f_SCConv",
    "C3k2_SCConv",
    "C3k2_IEL",
    "C3k2_RetBlock",
}
# Modules that additionally get the repeat count inserted at args[2]
_REPEAT = {"C1", "C2", "C2f", "C3", "C3x", "C3k2", "C3k2_gai", "C2fPSA", "C2PSA", "C2fCIB", "RepC3",
           "C3Ghost", "BottleneckCSP", "C3TR", "C3k2_LRSA", "C3K2_OAtention", "C3K2_MultiOGA",
           "C2f_SCConv", "C3k2_SCConv", "C3k2_IEL", "C3k2_RetBlock"}
_HEADS = {"Detect", "Segment", "Pose", "OBB", "v10Detect"}


def load_model_yaml(path) -> dict:
    """Load a model YAML, inferring scale from filename like yolo11n.yaml."""
    path = Path(path)
    stem = path.stem
    m = re.match(r"(.*?)([nslmx])?(-\w+)?$", stem)
    unified = path
    scale = ""
    if not path.exists():
        # yolo11n.yaml -> yolo11.yaml with scale "n" (reference tasks.py:1108)
        m2 = re.match(r"(.*yolov?\d+)([nslmx])(.*)$", stem)
        if m2:
            scale = m2.group(2)
            unified = path.with_name(m2.group(1) + m2.group(3) + path.suffix)
    d = yaml.safe_load(unified.read_text())
    d["yaml_file"] = str(path)
    if scale:
        d["scale"] = scale
    return d


def _literal(a: Any, names: dict) -> Any:
    if isinstance(a, str):
        if a in names:
            return names[a]
        try:
            return ast.literal_eval(a)
        except (ValueError, SyntaxError):
            return a
    return a


def parse_model_yaml(d: dict, ch: int = 3, scale: str = "", task: str = "detect", verbose: bool = False) -> ModelSpec:
    """Parse a model dict into a ModelSpec (mirrors reference parse_model)."""
    nc = int(d.get("nc", 80))
    scales = d.get("scales")
    depth, width, max_channels = (
        d.get("depth_multiple", 1.0),
        d.get("width_multiple", 1.0),
        float("inf"),
    )
    scale = scale or d.get("scale", "")
    if scales:
        if not scale:
            scale = tuple(scales.keys())[0]
        depth, width, max_channels = scales[scale]
    kpt_shape = tuple(d.get("kpt_shape", (17, 3)))
    # `activation: nn.ReLU()` etc (reference tasks.py:999 Conv.default_act)
    act = "silu"
    act_str = str(d.get("activation", "")).lower()
    for key, name in (("leakyrelu", "lrelu"), ("relu", "relu"), ("silu", "silu"),
                      ("gelu", "gelu"), ("hardswish", "hardswish"), ("mish", "mish")):
        if key in act_str:
            act = name
            break

    legacy = True
    channels = [ch]
    strides = [1]
    layers = []
    save = set()
    rows = list(d["backbone"]) + list(d["head"])
    names = {"nc": nc, "kpt_shape": list(kpt_shape)}
    for i, (f, n, m, args) in enumerate(rows):
        m = m.replace("nn.", "")  # nn.Upsample -> Upsample
        args = [_literal(a, names) for a in args]
        n_rep = max(round(n * depth), 1) if n > 1 else n

        fl = [f] if isinstance(f, int) else list(f)
        # resolve negative froms other than -1 to absolute layer indices
        # (-2 in the RT-DETR neck); -1 stays relative = "previous output"
        fl = [x if x == -1 else x % i for x in fl]
        c1 = channels[fl[0]] if fl[0] != -1 else channels[-1]
        in_stride = strides[fl[0]] if fl[0] != -1 else strides[-1]
        out_stride = in_stride

        if m in _CONVLIKE:
            c2 = args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            args = [c2, *args[1:]]
            if m in _REPEAT:
                args.insert(1, n_rep)  # (c2, n, ...)
                n_rep = 1
            if m in ("C3k2", "C3k2_gai"):
                legacy = False
                if scale in "mlx" and len(args) >= 3:
                    args[2] = True  # c3k=True for m/l/x (tasks.py:1047-1050)
            s = 1
            if m in ("Conv", "DWConv", "Pinwheel_shapedConv", "GhostConv", "GSConv") and len(args) >= 3:
                s = args[2]
            elif m == "SCDown" and len(args) >= 3:
                s = args[2]
            elif m in ("AConv", "ADown"):
                s = 2  # both are stride-2 downsamples (reference block.py:3692/3706)
            elif m == "Focus":
                s = 2
            if m in ("ConvTranspose2d", "DWConvTranspose2d"):
                # (c2, k, s, p): stride-s UPSAMPLE (yolov6 neck)
                out_stride = in_stride // (args[2] if len(args) > 2 else 2)
            else:
                out_stride = in_stride * s
        elif m == "Identity":
            c2 = c1
        elif m == "CBLinear":
            # args: ([c2s], k?, s?); downstream only CBFuse reads the taps
            c2 = sum(args[0])
        elif m == "CBFuse":
            # output matches the LAST input (the backbone tensor)
            c2 = channels[fl[-1]]
            out_stride = strides[fl[-1]]
        elif m == "ResNetLayer":
            # yaml carries c1 explicitly: (c1, c2, s, is_first, n)
            # (reference tasks.py ResNetLayer branch: c2 = 4*args[1] unless first)
            is_first = args[3] if len(args) > 3 else False
            c2 = args[1] if is_first else 4 * args[1]
            out_stride = in_stride * (4 if is_first else (args[2] if len(args) > 2 else 1))
        elif m == "HGStem":
            # (cm, c2) unscaled (reference tasks.py:1060); stem downsamples 4x
            c2 = args[1]
            out_stride = in_stride * 4
        elif m == "HGBlock":
            # (cm, c2, k, light, shortcut) -> insert repeats after k
            c2 = args[1]
            args = [args[0], args[1], args[2] if len(args) > 2 else 3, n_rep, *args[3:]]
            n_rep = 1
        elif m == "AIFI":
            c2 = c1
            # args stay (cm, num_heads)
        elif m == "RTDETRDecoder":
            in_ch = tuple(channels[x] for x in fl)
            args = [args[0], in_ch, *args[1:]]
            c2 = 0
            task = "detect"
            out_stride = 0
        elif m == "C2fAttn":
            # (c2, ec, nh) in YAML -> (c2, n, ec, nh); ec/nh scale per
            # reference tasks.py:1017-1021
            c2 = make_divisible(min(args[0], max_channels) * width, 8)
            ec = make_divisible(min(args[1], max_channels // 2) * width, 8)
            nh = int(max(round(min(args[2], max_channels // 2 // 32)) * width, 1)) if args[2] > 1 else args[2]
            args = [c2, n_rep, ec, nh]
            n_rep = 1
        elif m == "ImagePoolingAttn":
            # output is the updated TEXT features; spatial channels unchanged
            args = [args[0] if args else 256, tuple(channels[x] for x in fl)]
            c2 = c1
        elif m == "WorldDetect":
            in_ch = tuple(channels[x] for x in fl)
            args = [*args, in_ch, legacy]
            c2 = 0
            task = "detect"
            out_stride = 0
        elif m == "MSCAAttention":
            c2 = c1
            args = [c1, *args]
        elif m == "FocalModulation":
            # reference tasks.py:1055: args = [ch[f], *args]; channel-preserving
            c2 = c1
            args = [c1, *args]
        elif m == "ELA":
            # reference tasks.py:1066: constructed with c1; output channels = c1
            c2 = c1
            args = [c1]
        elif m == "Upsample":
            c2 = c1
            sf = args[1] if len(args) > 1 else 2
            out_stride = in_stride // int(sf)
        elif m == "Concat":
            c2 = sum(channels[x] if x != -1 else channels[-1] for x in fl)
            out_stride = strides[fl[0]] if fl[0] != -1 else strides[-1]
        elif m == "SpaceToDepth":
            # lossless pixel-unshuffle: (H,W,C) -> (H/b, W/b, b*b*C); the
            # MXU-fill stem of the -tpu model variants (docs/performance.md)
            b = args[0] if args else 2
            c2 = c1 * b * b
            out_stride = in_stride * b
        elif m == "MaxPool2d":
            # torch nn.MaxPool2d(k, s, p) used as a graph layer (yolov3-tiny)
            c2 = c1
            out_stride = in_stride * (args[1] if len(args) > 1 else args[0])
        elif m == "ZeroPad2d":
            # nn.ZeroPad2d([l, r, t, b]): +1px pre-pad for the stride-1 pool
            c2 = c1
        elif m == "BatchNorm2d":
            c2 = c1
        elif m == "Classify":
            c2 = args[0]
            args = [c2]
            task = "classify"
        elif m in _HEADS:
            in_ch = tuple(channels[x] for x in fl)
            args = [*args, in_ch]
            c2 = 0  # heads have no single channel count
            task = {"Detect": "detect", "Segment": "segment", "Pose": "pose", "OBB": "obb", "v10Detect": "detect"}[m]
            if m == "Segment" and isinstance(args[2], int):
                # args = [nc, nm, npr, in_ch]; npr gets width-scaled (tasks.py:1084)
                args[2] = make_divisible(min(args[2], max_channels) * width, 8)
            if m == "Pose" and len(args) >= 2 and isinstance(args[1], (list, tuple)):
                kpt_shape = tuple(args[1])
            args.append(legacy)
            out_stride = 0
        elif m == "Index":
            c2 = channels[fl[-1]]
        elif m in ("YoloNASStem", "YoloNASStage"):
            # NAS blocks carry explicit (unscaled) channels from the
            # published arch params (modules_nas.py header)
            c2 = args[0]
            out_stride = in_stride * 2
        elif m == "NASUpMerge":
            # inputs [pre(deep), skip1, skip2]; output at skip1's stride
            c2 = args[0]
            out_stride = in_stride // 2
        elif m == "NASDown":
            c2 = args[0]
            out_stride = in_stride * 2
        elif m == "NASDetect":
            in_ch = tuple(channels[x] for x in fl)
            args = [args[0] if args else nc, *args[1:], in_ch]
            c2 = 0
            task = "detect"
            out_stride = 0
        else:
            raise NotImplementedError(
                f"module '{m}' (layer {i}) is not supported by the TPU graph parser yet"
            )

        layers.append(
            LayerSpec(
                i=i,
                f=tuple(fl),
                n=n_rep,
                module=m,
                args=tuple(_freeze(a) for a in args),
                c1=c1,
                c2=c2,
                stride=out_stride,
            )
        )
        save.update(x % i for x in fl if x != -1)
        if i == 0:
            channels = []
            strides = []
        channels.append(c2)
        strides.append(out_stride)

    names_map = d.get("names") or {}
    class_names = tuple(names_map[k] for k in sorted(names_map)) if names_map else tuple(
        str(j) for j in range(nc)
    )
    return ModelSpec(
        layers=tuple(layers),
        save=tuple(sorted(save)),
        nc=nc,
        scale=scale,
        task=task,
        yaml_name=str(d.get("yaml_file", "")),
        kpt_shape=kpt_shape,
        names=class_names,
        act=act,
    )


def _freeze(a: Any) -> Any:
    if isinstance(a, list):
        return tuple(_freeze(x) for x in a)
    return a
