"""Graph-walking task model (reference: ultralytics/nn/tasks.py BaseModel/_predict_once).

``DetectionGraph`` is a flax module that executes a parsed ``ModelSpec``:
sequential layer walk with a save-list for feature reuse, exactly mirroring
the reference's nn.Sequential + save semantics (tasks.py:138-166) but with
static shapes and NHWC layout. Submodules are named ``m{i}`` to give stable
parameter paths for the torch->JAX weight converter.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from bsyolo_tpu.nn import heads as H
from bsyolo_tpu.nn import modules as M
from bsyolo_tpu.nn.parser import LayerSpec, ModelSpec

Array = jax.Array


def _build_module(spec: LayerSpec, dtype, name: Optional[str] = None) -> Optional[nn.Module]:
    """Instantiate the flax module for one layer spec (None for stateless ops)."""
    m, a = spec.module, spec.args
    name = name or f"m{spec.i}"
    if m == "Conv":
        c2, k, s = a[0], a[1] if len(a) > 1 else 1, a[2] if len(a) > 2 else 1
        p = a[3] if len(a) > 3 else None
        g = a[4] if len(a) > 4 else 1
        d = a[5] if len(a) > 5 else 1
        act = a[6] if len(a) > 6 else True
        return M.ConvBN(c2, k, s, p=p, g=g, d=d, act=act, dtype=dtype, name=name)
    if m == "DWConv":
        c2, k = a[0], a[1] if len(a) > 1 else 1
        s = a[2] if len(a) > 2 else 1
        d = a[3] if len(a) > 3 else 1
        act = a[4] if len(a) > 4 else True
        return M.DWConvBN(c2, k, s, d=d, act=act, dtype=dtype, name=name)
    if m == "Pinwheel_shapedConv":
        return M.PinwheelConv(a[0], a[1], a[2], dtype=dtype, name=name)
    if m in ("C3k2", "C3k2_gai"):
        c2, n = a[0], a[1]
        c3k = a[2] if len(a) > 2 else False
        e = a[3] if len(a) > 3 else 0.5
        g = a[4] if len(a) > 4 else 1
        shortcut = a[5] if len(a) > 5 else True
        cls = M.C3k2 if m == "C3k2" else M.C3k2_gai
        return cls(c2, n, shortcut, g, e, c3k=c3k, dtype=dtype, name=name)
    if m == "C2f":
        c2, n = a[0], a[1]
        shortcut = a[2] if len(a) > 2 else False
        g = a[3] if len(a) > 3 else 1
        return M.C2f(c2, n, shortcut, g, dtype=dtype, name=name)
    if m == "C2fCIB":
        c2, n = a[0], a[1]
        shortcut = a[2] if len(a) > 2 else False
        lk = a[3] if len(a) > 3 else False
        return M.C2fCIB(c2, n, shortcut, lk=lk, dtype=dtype, name=name)
    if m == "C2":
        c2, n = a[0], a[1]
        shortcut = a[2] if len(a) > 2 else True
        return M.C2(c2, n, shortcut, dtype=dtype, name=name)
    if m == "C3":
        c2, n = a[0], a[1]
        shortcut = a[2] if len(a) > 2 else True
        return M.C3(c2, n, shortcut, dtype=dtype, name=name)
    if m == "Bottleneck":
        c2 = a[0]
        shortcut = a[1] if len(a) > 1 else True
        return M.Bottleneck(c2, shortcut, dtype=dtype, name=name)
    if m == "HGStem":
        return M.HGStem(a[0], a[1], dtype=dtype, name=name)
    if m == "HGBlock":
        cm, c2, k, n = a[0], a[1], a[2], a[3]
        light = a[4] if len(a) > 4 else False
        shortcut = a[5] if len(a) > 5 else False
        return M.HGBlock(cm, c2, k, n, light, shortcut, dtype=dtype, name=name)
    if m == "RepC3":
        return M.RepC3(a[0], a[1], dtype=dtype, name=name)
    if m == "RepNCSPELAN4":
        return M.RepNCSPELAN4(a[0], a[1], a[2], a[3] if len(a) > 3 else 1, dtype=dtype, name=name)
    if m == "ELAN1":
        return M.ELAN1(a[0], a[1], a[2], dtype=dtype, name=name)
    if m == "AConv":
        return M.AConv(a[0], dtype=dtype, name=name)
    if m == "ADown":
        return M.ADown(a[0], dtype=dtype, name=name)
    if m == "SPPELAN":
        return M.SPPELAN(a[0], a[1], a[2] if len(a) > 2 else 5, dtype=dtype, name=name)
    if m == "ConvTranspose2d":
        # torch nn.ConvTranspose2d used directly as a graph layer (yolov6)
        c2, k = a[0], a[1] if len(a) > 1 else 2
        st = a[2] if len(a) > 2 else 2
        return M.ConvTranspose2dLayer(c2, k, st, dtype=dtype, name=name)
    if m == "ResNetLayer":
        # yaml args: (c1, c2, s, is_first, n) — c1 implicit from the graph
        return M.ResNetLayer(a[1], a[2] if len(a) > 2 else 1,
                             a[3] if len(a) > 3 else False, a[4] if len(a) > 4 else 1,
                             dtype=dtype, name=name)
    if m == "AIFI":
        from bsyolo_tpu.nn import transformer as T

        return T.AIFI(a[0], a[1] if len(a) > 1 else 8, dtype=dtype, name=name)
    if m == "GhostConv":
        c2, k = a[0], a[1] if len(a) > 1 else 1
        s = a[2] if len(a) > 2 else 1
        return M.GhostConv(c2, k, s, dtype=dtype, name=name)
    if m == "GhostBottleneck":
        c2, k = a[0], a[1] if len(a) > 1 else 3
        s = a[2] if len(a) > 2 else 1
        return M.GhostBottleneck(c2, k, s, dtype=dtype, name=name)
    if m == "C3Ghost":
        c2, n = a[0], a[1]
        return M.C3Ghost(c2, n, dtype=dtype, name=name)
    if m == "SPP":
        return M.SPP(a[0], tuple(a[1]) if len(a) > 1 else (5, 9, 13), dtype=dtype, name=name)
    if m == "SPPF":
        return M.SPPF(a[0], a[1] if len(a) > 1 else 5, dtype=dtype, name=name)
    if m == "C2PSA":
        c2, n = a[0], a[1]
        e = a[2] if len(a) > 2 else 0.5
        return M.C2PSA(c2, n, e, dtype=dtype, name=name)
    if m == "PSA":
        return M.PSA(a[0], a[1] if len(a) > 1 else 0.5, dtype=dtype, name=name)
    if m == "SCDown":
        return M.SCDown(a[0], a[1], a[2], dtype=dtype, name=name)
    if m == "MSCAAttention":
        return M.MSCAAttention(a[0], dtype=dtype, name=name)
    if m == "ELA":
        return M.ELA(a[0], dtype=dtype, name=name)
    if m in ("YoloNASStem", "YoloNASStage"):
        from bsyolo_tpu.nn import modules_nas as NAS

        if m == "YoloNASStem":
            return NAS.YoloNASStem(a[0], dtype=dtype, name=name)
        return NAS.YoloNASStage(a[0], a[1], a[2], a[3] if len(a) > 3 else False,
                                dtype=dtype, name=name)
    if m in ("Upsample", "Concat", "Index"):
        return None  # stateless
    mod = _build_extra_module(m, a, dtype, name)
    if mod is not None:
        return mod
    raise NotImplementedError(f"module {m} not wired into the graph builder")


def _build_extra_module(m: str, a, dtype, name: str) -> Optional[nn.Module]:
    """Experimental-zoo blocks (reference tasks.py:972-1066 + the sys/ copy's
    parser registrations) — see bsyolo_tpu/nn/modules_extra.py."""
    from bsyolo_tpu.nn import modules_extra as X

    def opt(i, default):
        return a[i] if len(a) > i else default

    if m == "SimSPPF":
        return X.SimSPPF(a[0], opt(1, 5), dtype=dtype, name=name)
    if m == "SPPFCSPC":
        return X.SPPFCSPC(a[0], opt(1, 1), opt(2, False), opt(3, 1), opt(4, 0.5),
                          opt(5, 5), dtype=dtype, name=name)
    if m == "BottleneckCSP":
        return X.BottleneckCSP(a[0], a[1], opt(2, True), opt(3, 1), opt(4, 0.5),
                               dtype=dtype, name=name)
    if m == "C3TR":
        return X.C3TR(a[0], a[1], opt(2, True), opt(3, 1), opt(4, 0.5),
                      dtype=dtype, name=name)
    if m == "GSConv":
        return X.GSConv(a[0], opt(1, 1), opt(2, 1), opt(3, 1), dtype=dtype, name=name)
    if m == "DWConvTranspose2d":
        return X.DWConvTranspose2dLayer(a[0], opt(1, 1), opt(2, 1), opt(3, 0),
                                        opt(4, 0), dtype=dtype, name=name)
    if m == "FocalModulation":
        return X.FocalModulation(a[0], opt(1, 3), opt(2, 2), opt(3, 2),
                                 dtype=dtype, name=name)
    if m in ("C3k2_LRSA", "C3K2_OAtention", "C3K2_MultiOGA"):
        cls = {"C3k2_LRSA": X.C3k2_LRSA, "C3K2_OAtention": X.C3K2_OAtention,
               "C3K2_MultiOGA": X.C3K2_MultiOGA}[m]
        c2, n = a[0], a[1]
        c3k = opt(2, False)
        e = opt(3, 0.5)
        g = opt(4, 1)
        shortcut = opt(5, True)
        return cls(c2, n, shortcut, g, e, c3k=c3k, dtype=dtype, name=name)
    if m == "CoordAtt":
        return X.CoordAtt(a[0], opt(1, 32), dtype=dtype, name=name)
    if m == "C2f_SCConv":
        return X.C2f_SCConv(a[0], a[1], opt(2, False), opt(3, 1), opt(4, 0.5),
                            dtype=dtype, name=name)
    if m == "C3k2_SCConv":
        return X.C3k2_SCConv(a[0], a[1], opt(5, True), opt(4, 1), opt(3, 0.5),
                             c3k=opt(2, False), dtype=dtype, name=name)
    if m == "C3k2_IEL":
        return X.C3k2_IEL(a[0], a[1], opt(5, True), opt(4, 1), opt(3, 0.5),
                          c3k=opt(2, False), dtype=dtype, name=name)
    if m == "C3k2_RetBlock":
        return X.C3k2_RetBlock(a[0], a[1], opt(2, "chunk"), opt(3, 8),
                               c3k=opt(4, False), e=opt(5, 0.5), dtype=dtype, name=name)
    return None


class _RepeatSeq(nn.Module):
    """n sequential copies of one layer module, children named "0".."n-1"
    (the reference's nn.Sequential repeat for non-CSP modules)."""

    layer: LayerSpec
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        for j in range(self.layer.n):
            x = _build_module(self.layer, self.dtype, name=str(j))(x, train)
        return x


class DetectionGraph(nn.Module):
    """Executes a ModelSpec. Output = head output (list of raw per-level maps)."""

    spec: ModelSpec
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False, text: Array = None, targets=None,
                 perturb: bool = False, return_saved: bool = False,
                 embed: tuple = ()):
        spec = self.spec
        if getattr(spec, "act", "silu") != M.default_act():
            # yaml `activation:` override (yolov6's nn.ReLU); trace-time
            # global, the analog of reference Conv.default_act
            M.set_default_act(spec.act)
        saved: Dict[int, Array] = {}
        embeddings: list = []  # pooled per-layer features when embed is set
        prev: Array = x
        txt = ori_txt = None
        if any(l.module in ("C2fAttn", "ImagePoolingAttn", "WorldDetect") for l in spec.layers):
            if text is None:
                # untrained placeholder text features, the analog of reference
                # WorldModel.txt_feats = randn(1, nc, 512) (tasks.py:608): a
                # deterministic buffer, NOT a parameter — set_classes swaps it
                import numpy as _np

                text = jnp.asarray(
                    _np.random.default_rng(0).normal(size=(1, spec.nc, 512)).astype(_np.float32)
                )
            if text.shape[0] != x.shape[0]:
                text = jnp.broadcast_to(text, (x.shape[0],) + text.shape[1:])
            txt = ori_txt = text.astype(self.dtype)
        for layer in spec.layers:
            m = layer.module
            if m == "C2fAttn":
                src = saved[layer.f[0]] if layer.f[0] != -1 else prev
                a = layer.args
                prev = M.C2fAttn(
                    a[0], a[1], a[2], a[3], dtype=self.dtype, name=f"m{layer.i}"
                )(src, txt, train)
            elif m == "ImagePoolingAttn":
                feats = [saved[j] if j != -1 else prev for j in layer.f]
                a = layer.args
                txt = M.ImagePoolingAttn(
                    a[0], tuple(a[1]), dtype=self.dtype, name=f"m{layer.i}"
                )(feats, txt, train)
                prev = txt  # recorded in save-list slots, never used spatially
            elif m == "WorldDetect":
                feats = [saved[j] if j != -1 else prev for j in layer.f]
                a = layer.args
                prev = H.WorldDetect(
                    a[0], a[3], spec.head_strides, a[1], a[2], dtype=self.dtype,
                    name=f"m{layer.i}",
                )(feats, ori_txt, train)
            elif m == "RTDETRDecoder":
                from bsyolo_tpu.nn import transformer as T

                feats = [saved[j] if j != -1 else prev for j in layer.f]
                a = layer.args
                prev = T.RTDETRDecoder(
                    a[0], tuple(a[1]), dtype=self.dtype, name=f"m{layer.i}"
                )(feats, train=train, targets=targets)
            elif m in ("Detect", "Segment", "Pose", "OBB", "v10Detect"):
                feats = [saved[j] if j != -1 else prev for j in layer.f]
                prev = self._head(layer, feats, train)
            elif m in ("NASUpMerge", "NASDown", "NASDetect"):
                from bsyolo_tpu.nn import modules_nas as NAS

                feats = [saved[j] if j != -1 else prev for j in layer.f]
                a = layer.args
                if m == "NASDetect":
                    prev = NAS.NASDetect(
                        a[0], a[-1], spec.head_strides,
                        inter=tuple(a[1]) if len(a) > 2 else (64, 128, 256),
                        dtype=self.dtype, name=f"m{layer.i}",
                    )(feats, train)
                else:
                    cls = NAS.NASUpMerge if m == "NASUpMerge" else NAS.NASDown
                    prev = cls(a[0], a[1], a[2], dtype=self.dtype, name=f"m{layer.i}")(feats, train)
            elif m == "Identity":
                prev = saved[layer.f[0]] if layer.f[0] != -1 else prev
            elif m == "CBLinear":
                src = saved[layer.f[0]] if layer.f[0] != -1 else prev
                a = layer.args
                prev = M.CBLinear(tuple(a[0]), a[1] if len(a) > 1 else 1,
                                  a[2] if len(a) > 2 else 1, dtype=self.dtype,
                                  name=f"m{layer.i}")(src, train)
            elif m == "CBFuse":
                xs = [saved[j] if j != -1 else prev for j in layer.f]
                prev = M.cb_fuse(xs, list(layer.args[0]))
            elif m == "Concat":
                xs = [saved[j] if j != -1 else prev for j in layer.f]
                prev = jnp.concatenate(xs, axis=-1)
            elif m == "Upsample":
                prev = M.upsample2x_nearest(prev)
            elif m == "SpaceToDepth":
                src = saved[layer.f[0]] if layer.f[0] != -1 else prev
                prev = M.space_to_depth(src, layer.args[0] if layer.args else 2)
            elif m == "MaxPool2d":
                src = saved[layer.f[0]] if layer.f[0] != -1 else prev
                a = layer.args
                prev = M.max_pool2d(src, a[0], a[1] if len(a) > 1 else a[0],
                                    a[2] if len(a) > 2 else 0)
            elif m == "ZeroPad2d":
                src = saved[layer.f[0]] if layer.f[0] != -1 else prev
                prev = M.zero_pad2d(src, tuple(layer.args[0]))
            elif m == "Index":
                prev = saved[layer.f[-1]]
            elif m == "Classify":
                src = saved[layer.f[0]] if layer.f[0] != -1 else prev
                prev = H.Classify(
                    layer.args[0], dropout=getattr(spec, "dropout", 0.0),
                    dtype=self.dtype, name=f"m{layer.i}",
                )(src, train)
            else:
                src = saved[layer.f[0]] if layer.f[0] != -1 else prev
                if layer.n > 1:
                    # plain modules with repeats become an nn.Sequential in
                    # the reference (tasks.py parse_model) with children
                    # named 0..n-1 — mirror that for weight-path parity
                    prev = _RepeatSeq(layer, self.dtype, name=f"m{layer.i}")(src, train)
                else:
                    mod = _build_module(layer, self.dtype)
                    prev = mod(src, train)
            if train and getattr(prev, "ndim", 0) == 4 and m not in (
                "Concat", "Upsample", "Index", "Identity", "SpaceToDepth", "ZeroPad2d"
            ):
                # pure rearrangement layers are skipped: their outputs are
                # views/copies of already-tagged inputs, so tagging them under
                # remat='seg' would duplicate saved boundaries (ADVICE r4)
                # segment-remat boundary tag: identity at runtime (XLA drops
                # name_p), but under `cfg remat=seg` the train step checkpoints
                # the forward with save_only_these_names("bs_seg") — ONLY these
                # per-layer boundary activations are saved, every intra-block
                # residual (conv inputs, pre-activations, BN intermediates) is
                # recomputed from the nearest boundary during the backward.
                # Train-only so inference/export jaxprs (ONNX lowering,
                # jax2tf) never see the primitive.
                from jax.ad_checkpoint import checkpoint_name

                prev = checkpoint_name(prev, "bs_seg")
            if perturb and getattr(prev, "ndim", 0) == 4:  # head outputs are lists/dicts — skip
                # zero-valued additive hooks: grads w.r.t. the 'perturbations'
                # collection ARE grads w.r.t. each layer activation — the
                # GradCAM tap (utils/visualize.grad_cam; the TPU answer to
                # reference sys/heatmap.py:22 ActivationsAndGradients)
                prev = self.perturb(f"l{layer.i}", prev)
            if layer.i in spec.save:
                saved[layer.i] = prev
            if embed and layer.i in embed:
                # reference nn/tasks.py:161-164: adaptive_avg_pool2d(x,(1,1))
                # per embed layer, concatenated over channels; the graph walk
                # stops at the last requested layer (static tuple -> static
                # trace, later layers never enter the compiled program)
                e = prev
                embeddings.append(
                    jnp.mean(e, axis=(1, 2)) if getattr(e, "ndim", 0) == 4
                    else jnp.reshape(e, (e.shape[0], -1))
                )
                if layer.i == max(embed):
                    return jnp.concatenate(embeddings, axis=1)
        if return_saved:
            # (output, save-list features) — used by the per-stage profiler so
            # a truncated prefix graph keeps every branch observable (XLA
            # would otherwise dead-code-eliminate saved-but-unconsumed layers)
            return prev, saved
        return prev

    def _head(self, layer: LayerSpec, feats, train: bool):
        spec = self.spec
        name = f"m{layer.i}"
        strides = spec.head_strides
        a = layer.args
        legacy = a[-1]
        if layer.module == "Detect":
            nc, ch = a[0], a[1]
            return H.Detect(nc, ch, strides, legacy=legacy, dtype=self.dtype, name=name)(feats, train)
        if layer.module == "Segment":
            nc, nm, npr, ch = a[0], a[1], a[2], a[3]
            return H.Segment(nc, ch, strides, nm, npr, legacy=legacy, dtype=self.dtype, name=name)(
                feats, train
            )
        if layer.module == "Pose":
            nc, kpt_shape, ch = a[0], tuple(a[1]), a[2]
            return H.Pose(nc, ch, strides, kpt_shape, legacy=legacy, dtype=self.dtype, name=name)(
                feats, train
            )
        if layer.module == "OBB":
            nc, ne, ch = a[0], a[1], a[2]
            return H.OBB(nc, ch, strides, ne, legacy=legacy, dtype=self.dtype, name=name)(feats, train)
        if layer.module == "v10Detect":
            nc, ch = a[0], a[1]
            return H.v10Detect(nc, ch, strides, dtype=self.dtype, name=name)(feats, train)
        raise NotImplementedError(layer.module)


def build_model(spec: ModelSpec, img_size: int = 640, dtype=jnp.float32, seed: int = 0):
    """Construct the graph model and initialize its variables.

    Returns (model, variables) where variables = {'params', 'batch_stats'}.
    init is jitted: eager linen init dispatches hundreds of individual op
    compiles, which is pathologically slow; one fused compile is ~10x faster.
    """
    import functools

    model = DetectionGraph(spec, dtype=dtype)
    dummy = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    init_fn = jax.jit(functools.partial(model.init, train=False))
    variables = init_fn(jax.random.PRNGKey(seed), dummy)
    return model, variables


def make_forward(model: DetectionGraph, train: bool = False):
    """A jitted pure forward: (variables, images NHWC) -> head output."""
    return jax.jit(lambda variables, x: model.apply(variables, x, train=train))


class TextConditioned:
    """Wrap a world graph so .apply always passes the text features (the
    predictor/validator/train-step call model.apply(variables, x, ...) with
    no text kwarg). Text is a (1, K, 512) constant closed into the compiled
    program — the TPU-native form of the reference's per-batch txt_feats
    (models/yolo/world/train.py:85 preprocess_batch), which re-encodes the
    same class names every step."""

    def __init__(self, model, text):
        self.model = model
        self.text = text

    def apply(self, variables, x, train=False, text=None, **kw):
        # an explicit text kwarg (e.g. an outer re-wrap after set_classes)
        # overrides the bound constant
        return self.model.apply(
            variables, x, train=train, text=self.text if text is None else text, **kw
        )


def cast_inference_params(variables, dtype=jnp.bfloat16):
    """Cast weight tensors to bf16 for inference (~30% faster on v5e; scalars
    and norm statistics stay f32). Training keeps f32 params."""
    def cast(x):
        return x.astype(dtype) if x.dtype == jnp.float32 and x.ndim >= 2 else x

    return jax.tree_util.tree_map(cast, variables)


def count_params(variables) -> int:
    params = variables["params"] if "params" in variables else variables
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
