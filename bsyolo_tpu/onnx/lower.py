"""Lower a traced jaxpr to an ONNX opset-13 graph.

Strategy (the tpu-native answer to the reference's torch.onnx trace): the
predict function is traced once with ``jax.make_jaxpr`` (params closed over as
constants), then each jax primitive is rewritten into standard ONNX ops. All
shapes are static, so every Reshape target and Slice bound is a baked int64
constant. Layout: jax convs here are NHWC/HWIO; ONNX Conv is NCHW/OIHW, so
inputs get a Transpose sandwich while *kernel* transposes are constant-folded
into the initializer at export time.

Deliberate dtype policy: the exported graph is float32 end-to-end — internal
bf16 casts are folded away (ONNX runtimes' bf16 support is spotty and the
numpy runtime has no bf16). This matches the reference exporter's default
(FP32 unless half=True, reference engine/exporter.py:463).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from bsyolo_tpu.onnx.builder import GraphBuilder


class UnsupportedPrimitive(NotImplementedError):
    """A jax primitive in the traced function has no ONNX lowering yet."""


_FOLD_DTYPES = {"bfloat16", "float16"}  # folded to f32 in the exported graph


def _np_dtype(aval_dtype) -> str:
    try:
        name = np.dtype(aval_dtype).name
    except TypeError:
        name = str(aval_dtype)
    return "float32" if name in _FOLD_DTYPES else name


def _inverse_perm(perm: Sequence[int]) -> List[int]:
    inv = [0] * len(perm)
    for i, p in enumerate(perm):
        inv[p] = i
    return inv


class _Lowerer:
    def __init__(self, builder: GraphBuilder):
        self.b = builder
        self.env: Dict[Any, str] = {}  # jax Var -> onnx value name
        self.const_values: Dict[str, np.ndarray] = {}  # initializer name -> value

    # --- value plumbing ----------------------------------------------------

    def read(self, atom) -> str:
        from jax.extend.core import Literal

        if isinstance(atom, Literal):
            val = np.asarray(atom.val)
            if val.dtype.kind == "f" or str(val.dtype) in _FOLD_DTYPES:
                val = val.astype(np.float32)
            return self.const(val)
        return self.env[atom]

    def shape(self, atom) -> tuple:
        return tuple(atom.aval.shape)

    def const(self, array: np.ndarray) -> str:
        name = self.b.const_cached(np.asarray(array))
        self.const_values[name] = np.asarray(array)
        return name

    def i64(self, values) -> str:
        return self.const(np.asarray(values, dtype=np.int64))

    def write(self, var, name: str):
        self.env[var] = name

    # --- constant folding helpers -------------------------------------------

    def fold_or_node(self, src: str, fold: Callable[[np.ndarray], np.ndarray], emit: Callable[[str], str]) -> str:
        """If src is a known constant, fold in numpy; else emit runtime node(s)."""
        if src in self.const_values:
            return self.const(fold(self.const_values[src]))
        return emit(src)

    def transpose(self, src: str, perm: Sequence[int]) -> str:
        if list(perm) == list(range(len(perm))):
            return src
        return self.fold_or_node(
            src,
            lambda v: np.transpose(v, perm),
            lambda s: self.b.node("Transpose", [s], perm=list(perm))[0],
        )

    def reshape(self, src: str, shape: Sequence[int]) -> str:
        return self.fold_or_node(
            src,
            lambda v: np.reshape(v, shape),
            lambda s: self.b.node("Reshape", [s, self.i64(list(shape))])[0],
        )

    # --- the walk -----------------------------------------------------------

    def lower_jaxpr(self, jaxpr, consts: Sequence[Any], invals: Sequence[str]):
        for var, const in zip(jaxpr.constvars, consts):
            arr = np.asarray(const)
            if arr.dtype.kind == "f" or str(arr.dtype) in _FOLD_DTYPES:
                arr = arr.astype(np.float32)
            self.write(var, self.const(arr))
        for var, name in zip(jaxpr.invars, invals):
            self.write(var, name)
        for eqn in jaxpr.eqns:
            self.lower_eqn(eqn)
        return [self.read(v) for v in jaxpr.outvars]

    def lower_eqn(self, eqn):
        from jax._src.core import DropVar

        prim = eqn.primitive.name
        # call-like primitives: inline the inner jaxpr
        inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr") or eqn.params.get("fun_jaxpr")
        if inner is not None and prim not in ("while", "scan", "cond"):
            closed = inner
            sub_jaxpr = getattr(closed, "jaxpr", closed)
            sub_consts = getattr(closed, "consts", [])
            invals = [self.read(a) for a in eqn.invars]
            # custom_jvp/vjp pass extra tangent args after the primal args
            invals = invals[: len(sub_jaxpr.invars)] if len(invals) >= len(sub_jaxpr.invars) else invals
            outs = _Lowerer.lower_sub(self, sub_jaxpr, sub_consts, invals)
            for var, name in zip(eqn.outvars, outs):
                if not isinstance(var, DropVar):
                    self.write(var, name)
            return
        handler = _HANDLERS.get(prim)
        if handler is None:
            raise UnsupportedPrimitive(
                f"jax primitive '{prim}' has no ONNX lowering; the onnx exporter "
                f"covers the inference primitive set (see bsyolo_tpu/onnx/lower.py)"
            )
        outs = handler(self, eqn)
        for var, name in zip(eqn.outvars, outs):
            if not isinstance(var, DropVar):
                self.write(var, name)

    def lower_sub(self, sub_jaxpr, sub_consts, invals):
        # same env/builder; sub-jaxpr vars are distinct objects so no collision
        return self.lower_jaxpr(sub_jaxpr, sub_consts, invals)


# --- primitive handlers -----------------------------------------------------
# each: (lowerer, eqn) -> list of output value names

_HANDLERS: Dict[str, Callable] = {}


def _register(*names):
    def deco(fn):
        for n in names:
            _HANDLERS[n] = fn
        return fn

    return deco


_EW_UNARY = {
    "logistic": "Sigmoid",
    "exp": "Exp",
    "log": "Log",
    "tanh": "Tanh",
    "sqrt": "Sqrt",
    "abs": "Abs",
    "neg": "Neg",
    "sign": "Sign",
    "floor": "Floor",
    "ceil": "Ceil",
    "round": "Round",  # both half-to-even
    "erf": "Erf",
    "not": "Not",
}
_EW_BINARY = {
    "add": "Add",
    "sub": "Sub",
    "mul": "Mul",
    "div": "Div",
    "max": "Max",
    "min": "Min",
    "pow": "Pow",
    "and": "And",
    "or": "Or",
    "xor": "Xor",
    "eq": "Equal",
    "lt": "Less",
    "le": "LessOrEqual",
    "gt": "Greater",
    "ge": "GreaterOrEqual",
    "rem": "Mod",
}


@_register(*_EW_UNARY)
def _unary(lw, eqn):
    return lw.b.node(_EW_UNARY[eqn.primitive.name], [lw.read(eqn.invars[0])])


@_register(*_EW_BINARY)
def _binary(lw, eqn):
    return lw.b.node(_EW_BINARY[eqn.primitive.name], [lw.read(a) for a in eqn.invars])


@_register("ne")
def _ne(lw, eqn):
    eq = lw.b.node("Equal", [lw.read(a) for a in eqn.invars])[0]
    return lw.b.node("Not", [eq])


@_register("rsqrt")
def _rsqrt(lw, eqn):
    s = lw.b.node("Sqrt", [lw.read(eqn.invars[0])])[0]
    return lw.b.node("Reciprocal", [s])


@_register("square")
def _square(lw, eqn):
    x = lw.read(eqn.invars[0])
    return lw.b.node("Mul", [x, x])


@_register("integer_pow")
def _integer_pow(lw, eqn):
    x = lw.read(eqn.invars[0])
    y = int(eqn.params["y"])
    p = lw.const(np.asarray(float(y), dtype=np.float32))
    return lw.b.node("Pow", [x, p])


@_register("stop_gradient", "copy")
def _alias(lw, eqn):
    return [lw.read(eqn.invars[0])]


@_register("convert_element_type")
def _convert(lw, eqn):
    x = lw.read(eqn.invars[0])
    src = _np_dtype(eqn.invars[0].aval.dtype)
    dst = _np_dtype(eqn.params["new_dtype"])
    if src == dst:  # includes bf16/f16 folded to f32
        return [x]
    from bsyolo_tpu.onnx import proto

    return lw.b.node("Cast", [x], to=proto.TENSOR_DTYPE[dst])


@_register("select_n")
def _select_n(lw, eqn):
    if len(eqn.invars) != 3:
        raise UnsupportedPrimitive("select_n with >2 cases")
    pred, case0, case1 = (lw.read(a) for a in eqn.invars)
    return lw.b.node("Where", [pred, case1, case0])


@_register("clamp")
def _clamp(lw, eqn):
    lo, x, hi = eqn.invars
    lo_n, x_n, hi_n = lw.read(lo), lw.read(x), lw.read(hi)
    if lw.shape(lo) == () and lw.shape(hi) == ():
        return lw.b.node("Clip", [x_n, lo_n, hi_n])
    m = lw.b.node("Max", [x_n, lo_n])[0]
    return lw.b.node("Min", [m, hi_n])


@_register("reduce_sum", "reduce_max", "reduce_min", "reduce_prod")
def _reduce(lw, eqn):
    x = lw.read(eqn.invars[0])
    axes = [int(a) for a in eqn.params["axes"]]
    prim = eqn.primitive.name
    if prim == "reduce_sum":
        # opset 13: ReduceSum takes axes as an input tensor
        return lw.b.node("ReduceSum", [x, lw.i64(axes)], keepdims=0)
    op = {"reduce_max": "ReduceMax", "reduce_min": "ReduceMin", "reduce_prod": "ReduceProd"}[prim]
    return lw.b.node(op, [x], axes=axes, keepdims=0)


@_register("argmax", "argmin")
def _argreduce(lw, eqn):
    x = lw.read(eqn.invars[0])
    axes = eqn.params["axes"]
    if len(axes) != 1:
        raise UnsupportedPrimitive("argmax over multiple axes")
    op = "ArgMax" if eqn.primitive.name == "argmax" else "ArgMin"
    out = lw.b.node(op, [x], axis=int(axes[0]), keepdims=0)[0]
    dst = _np_dtype(eqn.params["index_dtype"])
    if dst != "int64":
        from bsyolo_tpu.onnx import proto

        return lw.b.node("Cast", [out], to=proto.TENSOR_DTYPE[dst])
    return [out]


@_register("concatenate")
def _concat(lw, eqn):
    return lw.b.node("Concat", [lw.read(a) for a in eqn.invars], axis=int(eqn.params["dimension"]))


@_register("reshape")
def _reshape(lw, eqn):
    if eqn.params.get("dimensions") is not None:
        raise UnsupportedPrimitive("reshape with dimensions (fused transpose)")
    return [lw.reshape(lw.read(eqn.invars[0]), [int(d) for d in eqn.outvars[0].aval.shape])]


@_register("squeeze", "expand_dims")
def _rank_change(lw, eqn):
    return [lw.reshape(lw.read(eqn.invars[0]), [int(d) for d in eqn.outvars[0].aval.shape])]


@_register("transpose")
def _transpose(lw, eqn):
    return [lw.transpose(lw.read(eqn.invars[0]), [int(p) for p in eqn.params["permutation"]])]


@_register("broadcast_in_dim")
def _broadcast(lw, eqn):
    x = lw.read(eqn.invars[0])
    in_shape = lw.shape(eqn.invars[0])
    out_shape = [int(d) for d in eqn.params["shape"]]
    bd = [int(d) for d in eqn.params["broadcast_dimensions"]]
    mid = [1] * len(out_shape)
    for i, pos in enumerate(bd):
        mid[pos] = int(in_shape[i])
    name = x if list(in_shape) == mid else lw.reshape(x, mid)
    if mid == out_shape:
        return [name]
    if name in lw.const_values:
        return [lw.const(np.broadcast_to(lw.const_values[name].reshape(mid), out_shape).copy())]
    return lw.b.node("Expand", [name, lw.i64(out_shape)])


@_register("iota")
def _iota(lw, eqn):
    shape = [int(d) for d in eqn.params["shape"]]
    dim = int(eqn.params["dimension"])
    dtype = np.dtype(_np_dtype(eqn.params["dtype"]))
    rng = np.arange(shape[dim], dtype=dtype)
    view = [1] * len(shape)
    view[dim] = shape[dim]
    return [lw.const(np.broadcast_to(rng.reshape(view), shape).copy())]


@_register("slice")
def _slice(lw, eqn):
    x = lw.read(eqn.invars[0])
    starts = [int(s) for s in eqn.params["start_indices"]]
    ends = [int(s) for s in eqn.params["limit_indices"]]
    strides = eqn.params.get("strides")
    steps = [int(s) for s in strides] if strides is not None else [1] * len(starts)
    axes = list(range(len(starts)))
    return lw.b.node("Slice", [x, lw.i64(starts), lw.i64(ends), lw.i64(axes), lw.i64(steps)])


@_register("rev")
def _rev(lw, eqn):
    x = lw.read(eqn.invars[0])
    shape = lw.shape(eqn.invars[0])
    axes = [int(d) for d in eqn.params["dimensions"]]
    starts = [int(shape[a]) - 1 for a in axes]
    ends = [-(int(shape[a]) + 1) for a in axes]
    steps = [-1] * len(axes)
    return lw.b.node("Slice", [x, lw.i64(starts), lw.i64(ends), lw.i64(axes), lw.i64(steps)])


@_register("split")
def _split(lw, eqn):
    x = lw.read(eqn.invars[0])
    sizes = [int(s) for s in eqn.params["sizes"]]
    axis = int(eqn.params["axis"])
    # opset 13: split lengths are an input tensor
    return lw.b.node("Split", [x, lw.i64(sizes)], n_outputs=len(sizes), axis=axis)


@_register("pad")
def _pad(lw, eqn):
    x, pad_val = eqn.invars
    cfg = [(int(lo), int(hi), int(interior)) for lo, hi, interior in eqn.params["padding_config"]]
    name = lw.read(x)
    shape = [int(s) for s in lw.shape(x)]
    # interior (dilation) padding first — XLA dilates, THEN applies lo/hi
    # edges. ONNX Pad has no interior mode, so decompose per axis: unsqueeze
    # after d, Pad i copies of pad_val after each element, merge, and drop
    # the i trailing fill values (the last element gets no interior pad).
    for d, (_, _, i) in enumerate(cfg):
        if i == 0:
            continue
        n = shape[d]
        us = shape[: d + 1] + [1] + shape[d + 1 :]
        name = lw.reshape(name, us)
        pads = [0] * len(us) * 2
        pads[len(us) + d + 1] = i  # ONNX layout: begins..., ends...
        name = lw.b.node("Pad", [name, lw.i64(pads), lw.read(pad_val)])[0]
        name = lw.reshape(name, shape[:d] + [n * (1 + i)] + shape[d + 1 :])
        target = n + max(n - 1, 0) * i
        if target != n * (1 + i):
            name = lw.b.node(
                "Slice", [name, lw.i64([0]), lw.i64([target]), lw.i64([d])]
            )[0]
        shape[d] = target
    pos = [(max(lo, 0), max(hi, 0)) for lo, hi, _ in cfg]
    neg = [(min(lo, 0), min(hi, 0)) for lo, hi, _ in cfg]
    if any(p != (0, 0) for p in pos):
        pads = [p[0] for p in pos] + [p[1] for p in pos]
        name = lw.b.node("Pad", [name, lw.i64(pads), lw.read(pad_val)])[0]
    if any(nd != (0, 0) for nd in neg):
        padded = [s + pos[i][0] + pos[i][1] for i, s in enumerate(shape)]
        starts = [-nd[0] for nd in neg]
        ends = [padded[i] + neg[i][1] for i in range(len(neg))]
        axes = list(range(len(neg)))
        name = lw.b.node("Slice", [name, lw.i64(starts), lw.i64(ends), lw.i64(axes)])[0]
    return [name]


@_register("cumsum")
def _cumsum(lw, eqn):
    x = lw.read(eqn.invars[0])
    if eqn.params.get("reverse"):
        raise UnsupportedPrimitive("reverse cumsum")
    return lw.b.node("CumSum", [x, lw.i64(int(eqn.params["axis"]))])


@_register("top_k")
def _top_k(lw, eqn):
    x = lw.read(eqn.invars[0])
    k = int(eqn.params["k"])
    vals, idx = lw.b.node("TopK", [x, lw.i64([k])], n_outputs=2, axis=-1, largest=1, sorted=1)
    idx_dtype = _np_dtype(eqn.outvars[1].aval.dtype)
    if idx_dtype != "int64":
        from bsyolo_tpu.onnx import proto

        idx = lw.b.node("Cast", [idx], to=proto.TENSOR_DTYPE[idx_dtype])[0]
    return [vals, idx]


def _lower_pool(lw, eqn, prim_name, emit_pool):
    """Shared reduce_window pool scaffolding: partition pooled/free axes,
    collapse free axes into a fake batch, run the 1-channel ONNX pool, and
    restore the original layout. ``emit_pool(xt, kernel, strides, pads) ->
    name`` supplies the op-specific node(s)."""
    p = eqn.params
    window = [int(w) for w in p["window_dimensions"]]
    strides = [int(s) for s in p["window_strides"]]
    padding = [(int(lo), int(hi)) for lo, hi in p["padding"]]
    if any(int(d) != 1 for d in p.get("base_dilation", [1] * len(window))):
        raise UnsupportedPrimitive(f"{prim_name} with base dilation")
    dil = [int(d) for d in p.get("window_dilation", [1] * len(window))]
    rank = len(window)
    pooled = [i for i in range(rank) if window[i] != 1 or strides[i] != 1 or padding[i] != (0, 0)]
    if not pooled:
        return [lw.read(eqn.invars[0])]
    free = [i for i in range(rank) if i not in pooled]
    x = lw.read(eqn.invars[0])
    in_shape = lw.shape(eqn.invars[0])
    out_shape = [int(d) for d in eqn.outvars[0].aval.shape]
    perm = free + pooled
    xt = lw.transpose(x, perm)
    free_elems = int(np.prod([in_shape[i] for i in free])) if free else 1
    xt = lw.reshape(xt, [free_elems, 1] + [int(in_shape[i]) for i in pooled])
    pads = [padding[i][0] for i in pooled] + [padding[i][1] for i in pooled]
    pool = emit_pool(
        xt,
        [window[i] for i in pooled],
        [strides[i] for i in pooled],
        pads,
        [dil[i] for i in pooled],
    )
    pool = lw.reshape(pool, [int(out_shape[i]) for i in free] + [int(out_shape[i]) for i in pooled])
    return [lw.transpose(pool, _inverse_perm(perm))]


@_register("reduce_window_max")
def _reduce_window_max(lw, eqn):
    def emit(xt, kernel, strides, pads, dil):
        return lw.b.node(
            "MaxPool", [xt], kernel_shape=kernel, strides=strides, pads=pads, dilations=dil
        )[0]

    return _lower_pool(lw, eqn, "reduce_window_max", emit)


@_register("reduce_window_sum")
def _reduce_window_sum(lw, eqn):
    """Sum-pool (jax avg_pool traces as reduce_window_sum + div): ONNX has
    no SumPool, so AveragePool with count_include_pad=1 times the window
    element count reproduces the sum exactly (pad contributes zeros)."""
    def emit(xt, kernel, strides, pads, dil):
        if any(d != 1 for d in dil):
            raise UnsupportedPrimitive("reduce_window_sum with window dilation")
        pool = lw.b.node(
            "AveragePool", [xt], kernel_shape=kernel, strides=strides, pads=pads,
            count_include_pad=1,
        )[0]
        n_elem = float(np.prod(kernel))
        return lw.b.node("Mul", [pool, lw.const(np.asarray(n_elem, np.float32))])[0]

    return _lower_pool(lw, eqn, "reduce_window_sum", emit)


@_register("conv_general_dilated")
def _conv(lw, eqn):
    p = eqn.params
    dn = p["dimension_numbers"]
    lhs_spec, rhs_spec, out_spec = (list(map(int, s)) for s in (dn.lhs_spec, dn.rhs_spec, dn.out_spec))
    strides = [int(s) for s in p["window_strides"]]
    padding = [(int(lo), int(hi)) for lo, hi in p["padding"]]
    lhs_dil = [int(d) for d in p["lhs_dilation"]]
    rhs_dil = [int(d) for d in p["rhs_dilation"]]
    groups = int(p["feature_group_count"])
    if int(p.get("batch_group_count", 1)) != 1:
        raise UnsupportedPrimitive("conv batch_group_count > 1")

    x = lw.transpose(lw.read(eqn.invars[0]), lhs_spec)  # -> NC*S
    w = lw.transpose(lw.read(eqn.invars[1]), rhs_spec)  # -> OI*S (folded if const)

    n_spatial = len(strides)
    if any(d != 1 for d in lhs_dil):
        # zero-interleave the input spatially (lax lhs_dilation semantics,
        # used by ConvTranspose): reshape->pad->reshape per spatial axis
        x_shape = [int(lw.shape(eqn.invars[0])[a]) for a in lhs_spec]
        for si, d in enumerate(lhs_dil):
            if d == 1:
                continue
            ax = 2 + si
            cur = x_shape[:]
            mid = cur[:ax + 1] + [1] + cur[ax + 1 :]
            x = lw.reshape(x, mid)
            pads = [0] * len(mid) + [0] * len(mid)
            pads[len(mid) + ax + 1] = d - 1  # end-pad the inserted unit dim
            zero = lw.const(np.asarray(0.0, dtype=np.float32))
            x = lw.b.node("Pad", [x, lw.i64(pads), zero])[0]
            cur[ax] = cur[ax] * d
            x = lw.reshape(x, cur)
            # trim trailing zeros so size is (n-1)*d + 1
            starts, ends = [0], [cur[ax] - (d - 1)]
            x = lw.b.node("Slice", [x, lw.i64(starts), lw.i64(ends), lw.i64([ax])])[0]
            cur[ax] -= d - 1
            x_shape = cur

    pads_attr = [padding[i][0] for i in range(n_spatial)] + [padding[i][1] for i in range(n_spatial)]
    y = lw.b.node(
        "Conv",
        [x, w],
        strides=strides,
        pads=pads_attr,
        dilations=rhs_dil,
        group=groups,
    )[0]
    return [lw.transpose(y, _inverse_perm(out_spec))]


@_register("dot_general")
def _dot_general(lw, eqn):
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lhs, rhs = eqn.invars
    ls, rs = lw.shape(lhs), lw.shape(rhs)
    lc, rc, lb, rb = list(map(int, lc)), list(map(int, rc)), list(map(int, lb)), list(map(int, rb))
    lfree = [i for i in range(len(ls)) if i not in lc and i not in lb]
    rfree = [i for i in range(len(rs)) if i not in rc and i not in rb]
    bdims = [int(ls[i]) for i in lb]
    B = int(np.prod(bdims)) if bdims else 1
    M = int(np.prod([ls[i] for i in lfree])) if lfree else 1
    K = int(np.prod([ls[i] for i in lc])) if lc else 1
    N = int(np.prod([rs[i] for i in rfree])) if rfree else 1

    a = lw.transpose(lw.read(lhs), lb + lfree + lc)
    a = lw.reshape(a, [B, M, K] if bdims else [M, K])
    b = lw.transpose(lw.read(rhs), rb + rc + rfree)
    b = lw.reshape(b, [B, K, N] if bdims else [K, N])
    y = lw.b.node("MatMul", [a, b])[0]
    out_shape = [int(d) for d in eqn.outvars[0].aval.shape]
    return [lw.reshape(y, out_shape)]


@_register("sin")
def _sin(lw, eqn):
    return lw.b.node("Sin", [lw.read(eqn.invars[0])])


@_register("cos")
def _cos(lw, eqn):
    return lw.b.node("Cos", [lw.read(eqn.invars[0])])


@_register("atan2")
def _atan2(lw, eqn):
    # ONNX has no Atan2; decompose via atan(y/x) with quadrant fixup
    y, x = (lw.read(a) for a in eqn.invars)
    q = lw.b.node("Div", [y, x])[0]
    at = lw.b.node("Atan", [q])[0]
    pi = lw.const(np.asarray(np.pi, dtype=np.float32))
    zero = lw.const(np.asarray(0.0, dtype=np.float32))
    sign_y = lw.b.node("Sign", [y])[0]
    # y==0, x<0 should give pi; sign(0)=0 breaks that — nudge with (sign(y)>=0 -> +1)
    ge0 = lw.b.node("GreaterOrEqual", [sign_y, zero])[0]
    one = lw.const(np.asarray(1.0, dtype=np.float32))
    neg1 = lw.const(np.asarray(-1.0, dtype=np.float32))
    branch = lw.b.node("Where", [ge0, one, neg1])[0]
    corr = lw.b.node("Mul", [branch, pi])[0]
    xneg = lw.b.node("Less", [x, zero])[0]
    fix = lw.b.node("Where", [xneg, corr, zero])[0]
    return lw.b.node("Add", [at, fix])


@_register("reduce_or", "reduce_and")
def _reduce_bool(lw, eqn):
    from bsyolo_tpu.onnx import proto

    x = lw.read(eqn.invars[0])
    axes = [int(a) for a in eqn.params["axes"]]
    xi = lw.b.node("Cast", [x], to=proto.TENSOR_DTYPE["int32"])[0]
    if eqn.primitive.name == "reduce_or":
        r = lw.b.node("ReduceMax", [xi], axes=axes, keepdims=0)[0]
    else:
        r = lw.b.node("ReduceMin", [xi], axes=axes, keepdims=0)[0]
    return lw.b.node("Cast", [r], to=proto.TENSOR_DTYPE["bool"])


@_register("gather")
def _gather(lw, eqn):
    """Lower lax.gather to GatherND (static shapes, indexed dims collapsed).

    Covers the inference patterns: take_along_axis (vmapped or not, via
    operand_batching_dims), jnp.take / integer indexing, and iota-indexed
    strided views. Out-of-bounds behavior: indices are clamped (ONNX GatherND
    has no FILL mode); the decode paths clamp indices themselves and mask
    afterwards, so semantics match where it matters.
    """
    from bsyolo_tpu.onnx import proto

    dn = eqn.params["dimension_numbers"]
    operand, indices = eqn.invars
    o_shape = [int(d) for d in lw.shape(operand)]
    i_shape = [int(d) for d in lw.shape(indices)]
    out_shape = [int(d) for d in eqn.outvars[0].aval.shape]
    slice_sizes = [int(s) for s in eqn.params["slice_sizes"]]

    ob = list(getattr(dn, "operand_batching_dims", ()) or ())
    ib = list(getattr(dn, "start_indices_batching_dims", ()) or ())
    sim = [int(d) for d in dn.start_index_map]
    collapsed = sorted([int(d) for d in dn.collapsed_slice_dims] + ob)
    offset_out = [int(d) for d in dn.offset_dims]

    if (
        not ob
        and not collapsed
        and len(i_shape) == 1
        and offset_out == list(range(len(out_shape)))
        and all(slice_sizes[d] == o_shape[d] for d in range(len(o_shape)) if d not in sim)
    ):
        # dynamic_slice pattern: one scalar index vector selecting a
        # contiguous slice along sim; -> ONNX Slice with runtime starts,
        # clamped to [0, dim - size] (XLA dynamic_slice semantics)
        from bsyolo_tpu.onnx import proto

        sizes = [slice_sizes[d] for d in sim]
        idx_name = lw.read(indices)
        if _np_dtype(indices.aval.dtype) != "int64":
            idx_name = lw.b.node("Cast", [idx_name], to=proto.TENSOR_DTYPE["int64"])[0]
        lo = lw.const(np.zeros((len(sim),), dtype=np.int64))
        hi = lw.const(np.asarray([o_shape[d] - s for d, s in zip(sim, sizes)], dtype=np.int64))
        starts = lw.b.node("Max", [idx_name, lo])[0]
        starts = lw.b.node("Min", [starts, hi])[0]
        ends = lw.b.node("Add", [starts, lw.const(np.asarray(sizes, dtype=np.int64))])[0]
        out = lw.b.node("Slice", [lw.read(operand), starts, ends, lw.i64(sim)])[0]
        return [out]
    if len(ob) != len(ib):
        raise UnsupportedPrimitive("gather with asymmetric batching dims")
    k = i_shape[-1] if i_shape else 1
    if len(sim) != k:
        raise UnsupportedPrimitive("gather with non-trailing index vector dim")
    for d in sim:
        if slice_sizes[d] != 1 or d not in dn.collapsed_slice_dims:
            raise UnsupportedPrimitive("gather with sliced (non-collapsed) indexed dims")
    for d in ob:
        if slice_sizes[d] != 1:
            raise UnsupportedPrimitive("gather with sliced batch dims")
    offset_operand = [d for d in range(len(o_shape)) if d not in collapsed]
    for d in offset_operand:
        if slice_sizes[d] != o_shape[d]:
            raise UnsupportedPrimitive("gather with partial offset slices")

    b = len(ob)
    # transpose operand: batch dims, indexed dims (index-vector order), offsets
    perm_o = ob + sim + offset_operand
    op_name = lw.transpose(lw.read(operand), perm_o)

    # transpose indices: batch dims first, then remaining prefix, keep last
    idx_prefix = list(range(len(i_shape) - 1))
    rest_idx = [d for d in idx_prefix if d not in ib]
    perm_i = ib + rest_idx + [len(i_shape) - 1]
    idx_name = lw.read(indices)
    idx_dtype = _np_dtype(indices.aval.dtype)
    if idx_dtype != "int64":
        idx_name = lw.b.node("Cast", [idx_name], to=proto.TENSOR_DTYPE["int64"])[0]
    idx_name = lw.transpose(idx_name, perm_i)
    # clamp each index component to [0, dim-1]
    dims_max = np.asarray([o_shape[d] - 1 for d in sim], dtype=np.int64)
    zero = lw.const(np.zeros((k,), dtype=np.int64))
    idx_name = lw.b.node("Max", [idx_name, zero])[0]
    idx_name = lw.b.node("Min", [idx_name, lw.const(dims_max)])[0]

    gnd = lw.b.node("GatherND", [op_name, idx_name], batch_dims=b)[0]
    # GatherND output: [batch..., rest_idx..., offsets...] -> jax layout
    gnd_prefix = ib + rest_idx  # idx prefix dims in GatherND output order
    jax_prefix_positions = [p for p in range(len(out_shape)) if p not in offset_out]
    perm = [0] * len(out_shape)
    for i, p in enumerate(jax_prefix_positions):
        perm[p] = gnd_prefix.index(idx_prefix[i]) if idx_prefix else 0
    for j, p in enumerate(offset_out):
        perm[p] = len(gnd_prefix) + j
    out = lw.transpose(gnd, perm) if perm != list(range(len(out_shape))) else gnd
    return [lw.reshape(out, out_shape) if list(eqn.outvars[0].aval.shape) != out_shape else out]


def _scatter_nd(lw, eqn):
    """General set-scatter -> ScatterND: a (..., k) index array writing full
    slices along k operand axes (`x.at[i].set(u)` with array indices).

    XLA's drop-on-OOB semantics don't come free here (ONNX ScatterND is
    undefined for out-of-range indices), so the operand is padded with one
    dummy slot along the first indexed axis, invalid rows are redirected to
    the dummy, and the dummy is sliced off after the write. CLIP mode skips
    the dummy and clamps instead."""
    from jax.lax import GatherScatterMode

    from bsyolo_tpu.onnx import proto

    operand, indices, updates = eqn.invars
    dn = eqn.params["dimension_numbers"]
    o_shape = [int(d) for d in lw.shape(operand)]
    i_shape = [int(d) for d in lw.shape(indices)]
    u_shape = [int(d) for d in lw.shape(updates)]
    sdo = [int(d) for d in dn.scatter_dims_to_operand_dims]
    iwd = [int(d) for d in dn.inserted_window_dims]
    uwd = [int(d) for d in dn.update_window_dims]
    ob = list(getattr(dn, "operand_batching_dims", ()) or ())
    k = len(sdo)
    ndim = len(o_shape)
    rest = [d for d in range(ndim) if d not in sdo]
    n_batch = len(u_shape) - len(uwd)
    ok = (
        not ob
        and k >= 1
        and sorted(sdo) == iwd
        and (not i_shape or i_shape[-1] == k)
        and uwd == list(range(n_batch, len(u_shape)))
        and u_shape[n_batch:] == [o_shape[d] for d in rest]  # full window
        and i_shape[:-1] == u_shape[:n_batch]  # batch dims agree
    )
    if not ok:
        raise UnsupportedPrimitive("scatter outside the ScatterND-expressible pattern")

    n_rows = int(np.prod(i_shape[:-1])) if i_shape[:-1] else 1
    window = [o_shape[d] for d in rest]
    dims = np.asarray([o_shape[d] for d in sdo], dtype=np.int64)

    op_name = lw.read(operand)
    perm = sdo + rest
    if perm != list(range(ndim)):
        op_name = lw.transpose(op_name, perm)
    t_shape = [o_shape[d] for d in perm]

    idx = lw.read(indices)
    if _np_dtype(indices.aval.dtype) != "int64":
        idx = lw.b.node("Cast", [idx], to=proto.TENSOR_DTYPE["int64"])[0]
    idx = lw.reshape(idx, [n_rows, k])
    upd = lw.reshape(lw.read(updates), [n_rows] + window)

    mode = eqn.params.get("mode")
    clip = mode == GatherScatterMode.CLIP
    clamped = lw.b.node("Max", [idx, lw.const(np.zeros((k,), np.int64))])[0]
    clamped = lw.b.node("Min", [clamped, lw.const(dims - 1)])[0]
    if clip:
        data, idx_safe, n0 = op_name, clamped, None
    else:
        # FILL_OR_DROP / default: redirect invalid rows to a padded dummy slot
        n0 = t_shape[0]
        pads = [0] * (2 * ndim)
        pads[ndim] = 1  # one extra slot at the end of axis 0
        zero = lw.const(np.zeros((), np.dtype(_np_dtype(operand.aval.dtype))))
        data = lw.b.node("Pad", [op_name, lw.i64(pads), zero])[0]
        valid = lw.b.node("Equal", [idx, clamped])[0]  # in range per component
        valid = lw.b.node("Cast", [valid], to=proto.TENSOR_DTYPE["int64"])[0]
        valid = lw.b.node("ReduceMin", [valid, lw.i64([-1])], keepdims=1)[0]
        valid = lw.b.node("Cast", [valid], to=proto.TENSOR_DTYPE["bool"])[0]
        dummy = np.zeros((1, k), np.int64)
        dummy[0, 0] = n0
        idx_safe = lw.b.node("Where", [valid, clamped, lw.const(dummy)])[0]

    out = lw.b.node("ScatterND", [data, idx_safe, upd])[0]
    if not clip:
        out = lw.b.node(
            "Slice", [out, lw.i64([0]), lw.i64([n0]), lw.i64([0])]
        )[0]
    if perm != list(range(ndim)):
        inv = [perm.index(d) for d in range(ndim)]
        out = lw.transpose(out, inv)
    return [out]


@_register("scatter")
def _scatter(lw, eqn):
    """Restricted lax.scatter: a scalar index writing one slice along a single
    operand axis (`x.at[..., j].set(u)` patterns) -> one-hot Where blend.
    XLA drop-on-OOB semantics hold for free: an out-of-range index matches no
    iota lane, so the operand passes through unchanged."""
    from bsyolo_tpu.onnx import proto

    operand, indices, updates = eqn.invars
    dn = eqn.params["dimension_numbers"]
    o_shape = [int(d) for d in lw.shape(operand)]
    u_shape = [int(d) for d in lw.shape(updates)]
    sdo = [int(d) for d in dn.scatter_dims_to_operand_dims]
    iwd = [int(d) for d in dn.inserted_window_dims]
    uwd = [int(d) for d in dn.update_window_dims]
    ob = list(getattr(dn, "operand_batching_dims", ()) or ())
    idx_elems = int(np.prod(lw.shape(indices))) if lw.shape(indices) else 1
    if ob or len(sdo) != 1 or sdo != iwd or idx_elems != 1 or uwd != list(range(len(u_shape))):
        return _scatter_nd(lw, eqn)
    d = sdo[0]
    expected_u = [s for i, s in enumerate(o_shape) if i != d]
    if u_shape != expected_u:
        return _scatter_nd(lw, eqn)

    idx_name = lw.read(indices)
    if _np_dtype(indices.aval.dtype) != "int64":
        idx_name = lw.b.node("Cast", [idx_name], to=proto.TENSOR_DTYPE["int64"])[0]
    idx_name = lw.reshape(idx_name, [1] * len(o_shape))
    iota_view = [1] * len(o_shape)
    iota_view[d] = o_shape[d]
    iota = lw.const(np.arange(o_shape[d], dtype=np.int64).reshape(iota_view))
    mask = lw.b.node("Equal", [iota, idx_name])[0]
    upd_view = list(o_shape)
    upd_view[d] = 1
    upd = lw.reshape(lw.read(updates), upd_view)
    return lw.b.node("Where", [mask, upd, lw.read(operand)])


@_register("dynamic_slice")
def _dynamic_slice(lw, eqn):
    from bsyolo_tpu.onnx import proto

    operand = eqn.invars[0]
    starts_atoms = eqn.invars[1:]
    o_shape = [int(d) for d in lw.shape(operand)]
    sizes = [int(s) for s in eqn.params["slice_sizes"]]
    parts = []
    for a in starts_atoms:
        nm = lw.read(a)
        if nm in lw.const_values:
            parts.append(lw.const(np.asarray(lw.const_values[nm], np.int64).reshape(1)))
            continue
        if _np_dtype(a.aval.dtype) != "int64":
            nm = lw.b.node("Cast", [nm], to=proto.TENSOR_DTYPE["int64"])[0]
        parts.append(lw.reshape(nm, [1]))
    starts = lw.b.node("Concat", parts, axis=0)[0] if len(parts) > 1 else parts[0]
    lo = lw.const(np.zeros((len(o_shape),), dtype=np.int64))
    hi = lw.const(np.asarray([d - s for d, s in zip(o_shape, sizes)], dtype=np.int64))
    starts = lw.b.node("Max", [starts, lo])[0]
    starts = lw.b.node("Min", [starts, hi])[0]
    ends = lw.b.node("Add", [starts, lw.const(np.asarray(sizes, dtype=np.int64))])[0]
    return lw.b.node("Slice", [lw.read(operand), starts, ends, lw.i64(list(range(len(o_shape))))])


@_register("erfc")
def _erfc(lw, eqn):
    e = lw.b.node("Erf", [lw.read(eqn.invars[0])])[0]
    one = lw.const(np.asarray(1.0, dtype=np.float32))
    return lw.b.node("Sub", [one, e])


@_register("exp2")
def _exp2(lw, eqn):
    x = lw.read(eqn.invars[0])
    two = lw.const(np.asarray(2.0, dtype=np.float32))
    return lw.b.node("Pow", [two, x])


@_register("log1p")
def _log1p(lw, eqn):
    x = lw.read(eqn.invars[0])
    one = lw.const(np.asarray(1.0, dtype=np.float32))
    s = lw.b.node("Add", [x, one])[0]
    return lw.b.node("Log", [s])


@_register("while")
def _while(lw, eqn):
    """lax.while_loop -> ONNX Loop with a body subgraph.

    jax while carries are static-shape, which maps 1:1 onto Loop's
    loop-carried dependencies; cond runs once in the enclosing graph for the
    initial condition and again at the end of the body. Constants referenced
    by the body resolve through ONNX outer-scope name resolution (they live
    as root-graph initializers)."""
    p = eqn.params
    cond_closed, body_closed = p["cond_jaxpr"], p["body_jaxpr"]
    n_cc, n_bc = int(p["cond_nconsts"]), int(p["body_nconsts"])
    invals = [lw.read(a) for a in eqn.invars]
    cc, bc, init = invals[:n_cc], invals[n_cc : n_cc + n_bc], invals[n_cc + n_bc :]
    carry_avals = [v.aval for v in eqn.invars[n_cc + n_bc :]]

    cond_aval = cond_closed.jaxpr.outvars[0].aval

    def scalar_or(name: str) -> str:
        # vmapped while_loop keeps a batched predicate with continue-while-ANY
        # semantics (the body masks its own updates); reduce it to the scalar
        # bool the Loop op needs
        if tuple(cond_aval.shape) == ():
            return name
        from bsyolo_tpu.onnx import proto

        xi = lw.b.node("Cast", [name], to=proto.TENSOR_DTYPE["int32"])[0]
        r = lw.b.node(
            "ReduceMax", [xi], axes=list(range(len(cond_aval.shape))), keepdims=0
        )[0]
        return lw.b.node("Cast", [r], to=proto.TENSOR_DTYPE["bool"])[0]

    cond0 = scalar_or(lw.lower_sub(cond_closed.jaxpr, cond_closed.consts, cc + init)[0])

    iter_name, cond_in = lw.b.fresh("loop_iter"), lw.b.fresh("loop_cond")
    carry_in = [lw.b.fresh("loop_v") for _ in init]
    out_names: List[str] = []

    def build():
        new_carries = lw.lower_sub(body_closed.jaxpr, body_closed.consts, bc + carry_in)
        cond_next = scalar_or(
            lw.lower_sub(cond_closed.jaxpr, cond_closed.consts, cc + list(new_carries))[0]
        )
        for src in [cond_next] + list(new_carries):
            nm = lw.b.fresh("loop_out")
            lw.b.node("Identity", [src], outputs=[nm])
            out_names.append(nm)

    sub_inputs = [(iter_name, (), "int64"), (cond_in, (), "bool")] + [
        (n, [int(d) for d in a.shape], _np_dtype(a.dtype)) for n, a in zip(carry_in, carry_avals)
    ]
    out_specs = [((), "bool")] + [
        ([int(d) for d in a.shape], _np_dtype(a.dtype)) for a in carry_avals
    ]
    body = lw.b.subgraph("while_body", sub_inputs, build, out_names, out_specs)
    return lw.b.node("Loop", ["", cond0] + list(init), n_outputs=len(init), body=body)


# --- entry point -------------------------------------------------------------


def export_onnx(
    fn: Callable,
    example_args: Sequence[Any],
    path,
    input_names: Optional[Sequence[str]] = None,
    output_names: Optional[Sequence[str]] = None,
    name: str = "bsyolo",
) -> Path:
    """Trace ``fn(*example_args)`` and write an ONNX model to ``path``.

    ``example_args`` must be arrays (the predict signature is a single image
    batch). Returns the output path. Raises UnsupportedPrimitive when the
    traced graph uses a primitive outside the inference set.
    """
    import jax

    closed = jax.make_jaxpr(fn)(*example_args)
    jaxpr = closed.jaxpr
    builder = GraphBuilder(name=name)
    lw = _Lowerer(builder)

    in_names = list(input_names or [])
    while len(in_names) < len(jaxpr.invars):
        in_names.append(f"input_{len(in_names)}")
    for var, nm in zip(jaxpr.invars, in_names):
        builder.add_input(nm, [int(d) for d in var.aval.shape], _np_dtype(var.aval.dtype))

    raw_outs = lw.lower_jaxpr(jaxpr, closed.consts, in_names)

    out_names = list(output_names or [])
    while len(out_names) < len(raw_outs):
        out_names.append(f"output_{len(out_names)}")
    for i, (src, var) in enumerate(zip(raw_outs, jaxpr.outvars)):
        builder.node("Identity", [src], outputs=[out_names[i]])
        builder.add_output(out_names[i], [int(d) for d in var.aval.shape], _np_dtype(var.aval.dtype))

    path = Path(path)
    path.write_bytes(builder.model_bytes(doc="exported by bsyolo_tpu (jaxpr->onnx), opset 13"))
    return path
