"""Per-op differential fuzz for the self-contained ONNX stack.

The numpy runtime (bsyolo_tpu/onnx/runtime.py) and the jaxpr lowering
(bsyolo_tpu/onnx/lower.py) share an author, so model-level parity tests
could mask a shared misunderstanding of an op's semantics (round-4 verdict
item #6). This file attacks op-by-op:

- for EVERY primitive registered in ``lower._HANDLERS``, a near-single-
  primitive graph is exported with randomized inputs over multiple
  shapes/dtypes/seeds and re-executed by the independent numpy evaluator,
  compared elementwise against jax ground truth;
- a coverage gate fails the suite if any registered handler has no fuzz
  case (so new lowerings can't land untested);
- each artifact's wire bytes are round-tripped through the bundled
  protobuf codec (decode -> encode -> decode must be a fixed point) and,
  when protoc is available, structurally validated by ``protoc
  --decode_raw`` (the reference trusts onnxruntime here,
  engine/exporter.py:475 — a from-scratch toolchain self-checks instead).
"""

import shutil
import subprocess

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from bsyolo_tpu.onnx import OnnxModule, export_onnx, lower, proto  # noqa: E402

SEEDS = [0, 1, 2]
# call-like primitives are inlined by the lowerer, never dispatched to a handler
_CALL_PRIMS = {"jit", "pjit", "closed_call", "core_call", "custom_jvp_call", "custom_vjp_call"}


def _collect_prims(fn, args):
    seen = set()

    def walk(jx):
        for e in jx.eqns:
            seen.add(e.primitive.name)
            for p in e.params.values():
                if hasattr(p, "jaxpr"):
                    walk(p.jaxpr if hasattr(p.jaxpr, "eqns") else p.jaxpr.jaxpr)
                elif isinstance(p, (tuple, list)):
                    for q in p:
                        if hasattr(q, "jaxpr"):
                            walk(q.jaxpr if hasattr(q.jaxpr, "eqns") else q.jaxpr.jaxpr)

    closed = jax.make_jaxpr(fn)(*args)
    walk(closed.jaxpr)
    return seen - _CALL_PRIMS


def _dim(rng, lo=1, hi=7):
    return int(rng.integers(lo, hi))


# --- case table --------------------------------------------------------------
# label -> (fn, make_args(rng) -> list of np arrays). Shapes vary per seed.

CASES = {}


def case(label):
    def deco(pair_fn):
        CASES[label] = pair_fn
        return pair_fn

    return deco


@case("unary_smooth")  # tanh/logistic/exp/abs/neg/sign/sin/cos/erf/erfc
def _(rng):
    def f(x):
        return (jnp.tanh(x), lax.logistic(x), jnp.exp(x), jnp.abs(x), -x,
                jnp.sign(x), jnp.sin(x), jnp.cos(x), lax.erf(x), lax.erfc(x))

    return f, [rng.standard_normal((_dim(rng, 2), _dim(rng, 2), _dim(rng, 2))).astype(np.float32) * 2]


@case("unary_positive")  # log/sqrt/rsqrt/square/log1p/exp2
def _(rng):
    def f(x):
        return (jnp.log(x), jnp.sqrt(x), lax.rsqrt(x), lax.square(x),
                jnp.log1p(x), lax.exp2(x))

    return f, [(rng.random((_dim(rng, 2), _dim(rng, 2, 9))) + 0.1).astype(np.float32) * 3]


@case("unary_rounding")  # floor/ceil/round (half-to-even)
def _(rng):
    def f(x):
        return jnp.floor(x), jnp.ceil(x), jnp.round(x)

    # include exact .5 ties to pin round-half-to-even on both sides
    base = rng.standard_normal((_dim(rng, 2), 8)).astype(np.float32) * 4
    base[0] = np.arange(8, dtype=np.float32) * 0.5 - 2.0
    return f, [base]


@case("binary_arith")  # add/sub/mul/div/max/min/pow/rem/atan2
def _(rng):
    def f(a, b):
        return (a + b, a - b, a * b, a / b, jnp.maximum(a, b), jnp.minimum(a, b),
                jnp.abs(a) ** b, jnp.remainder(a, b), jnp.arctan2(a, b))

    sh = (_dim(rng, 2), _dim(rng, 2, 9))
    a = rng.standard_normal(sh).astype(np.float32) * 2
    b = (rng.random(sh).astype(np.float32) + 0.5) * np.where(rng.random(sh) < 0.5, -1, 1)
    return f, [a, b]


@case("int_arith")
def _(rng):
    def f(a, b):
        return a + b, a * b, a - b, jnp.maximum(a, b)

    sh = (_dim(rng, 2), _dim(rng, 2))
    return f, [rng.integers(-50, 50, sh).astype(np.int32),
               rng.integers(-50, 50, sh).astype(np.int32)]


@case("compare_logical")  # eq/ne/lt/le/gt/ge/and/or/xor/not/select_n
def _(rng):
    def f(a, b):
        p, q = a > b, a < b
        return (jnp.where(a >= b, a, b), (a == b) | (a != b), p & q, p ^ q, ~p,
                a <= b)

    sh = (_dim(rng, 2), _dim(rng, 2, 9))
    a = rng.integers(-3, 3, sh).astype(np.float32)
    b = rng.integers(-3, 3, sh).astype(np.float32)
    return f, [a, b]


@case("reduce_bool")  # reduce_or / reduce_and
def _(rng):
    def f(a):
        m = a > 0
        return jnp.any(m, axis=1), jnp.all(m, axis=0), jnp.any(m), jnp.all(m, axis=-1)

    return f, [rng.standard_normal((_dim(rng, 2), _dim(rng, 2), _dim(rng, 2))).astype(np.float32)]


@case("reduce_float")  # reduce_sum/max/min/prod incl. keepdims + full reduce
def _(rng):
    def f(a):
        return (jnp.sum(a, axis=1), jnp.max(a, axis=0), jnp.min(a, axis=-1),
                jnp.prod(a, axis=2), jnp.sum(a, axis=(0, 2), keepdims=True), jnp.sum(a))

    return f, [rng.standard_normal((_dim(rng, 2), _dim(rng, 2), _dim(rng, 2, 5))).astype(np.float32)]


@case("reduce_int")
def _(rng):
    def f(a):
        return jnp.sum(a, axis=0), jnp.max(a), jnp.min(a, axis=1)

    return f, [rng.integers(-9, 9, (_dim(rng, 2), _dim(rng, 2))).astype(np.int32)]


@case("argminmax")
def _(rng):
    def f(a):
        return (jnp.argmax(a, axis=1), jnp.argmin(a, axis=0),
                jnp.argmax(a, axis=-1))

    # distinct values so arg ties can't differ
    n = _dim(rng, 3) * _dim(rng, 2, 5)
    vals = rng.permutation(n * 2)[:n].astype(np.float32)
    return f, [vals.reshape(-1, _dim(rng, 1, 2) and n // _dim(rng, 1, 2) if False else vals.size // _gcd_shape(n))]


def _gcd_shape(n):
    for d in (3, 2):
        if n % d == 0:
            return d
    return 1


@case("cast")  # convert_element_type across f32/i32/bool/i64/f64->f32
def _(rng):
    def f(a, b):
        return (a.astype(np.int32), b.astype(np.float32), a.astype(bool),
                a.astype(np.float64).astype(np.float32), b.astype(np.int64))

    sh = (_dim(rng, 2), _dim(rng, 2))
    return f, [rng.standard_normal(sh).astype(np.float32) * 5,
               rng.integers(-5, 5, sh).astype(np.int32)]


@case("clamp_stopgrad_copy")
def _(rng):
    def f(a):
        # lax.clamp is the dedicated primitive; jnp.clip lowers to min/max
        return (jnp.clip(a, -0.5, 0.5), lax.clamp(-0.25, a, 0.75),
                lax.stop_gradient(a) * 2.0, jnp.copy(a))

    return f, [rng.standard_normal((_dim(rng, 2), _dim(rng, 2, 9))).astype(np.float32)]


@case("integer_pow")
def _(rng):
    def f(a):
        return a**2, a**3, a**-1

    return f, [(rng.random((_dim(rng, 2), _dim(rng, 2))) + 0.5).astype(np.float32)]


@case("shape_ops")  # reshape/squeeze/expand_dims/transpose/broadcast_in_dim/concatenate
def _(rng):
    def f(a, b):
        c = jnp.concatenate([a, b], axis=1)
        d = c.reshape(c.shape[0], -1, 1)
        return (d.squeeze(-1), d[:, None], jnp.transpose(c, (1, 0)),
                jnp.broadcast_to(a[:, :1], a.shape), c)

    n = _dim(rng, 2)
    return f, [rng.standard_normal((n, _dim(rng, 2))).astype(np.float32),
               rng.standard_normal((n, _dim(rng, 2))).astype(np.float32)]


@case("iota_slice_rev_split")
def _(rng):
    k = _dim(rng, 4, 9) * 2  # even, >=8

    def f(a):
        ar = jnp.arange(a.shape[1], dtype=a.dtype)
        s = lax.slice(a, (1, 0), (a.shape[0], a.shape[1]), (2, 3))
        lo, hi = jnp.split(a, 2, axis=1)
        return a + ar, s, jnp.flip(a, 0), jnp.flip(a, 1), lo * hi

    return f, [rng.standard_normal((_dim(rng, 3), k * 3)).astype(np.float32)]


@case("pad")
def _(rng):
    def f(a):
        return (jnp.pad(a, ((1, 2), (0, 3)), constant_values=-1.0),
                lax.pad(a, 0.5, ((2, 0, 0), (0, 1, 0))),
                lax.pad(a, 0.0, ((1, -1, 0), (0, 0, 0))),  # negative = crop
                lax.pad(a, 0.0, ((0, 0, 1), (0, 0, 0))))  # interior dilation

    return f, [rng.standard_normal((_dim(rng, 3), _dim(rng, 2))).astype(np.float32)]


@case("cumsum")
def _(rng):
    def f(a):
        return jnp.cumsum(a, axis=0), jnp.cumsum(a, axis=1)

    return f, [rng.standard_normal((_dim(rng, 2), _dim(rng, 2, 9))).astype(np.float32)]


@case("topk")
def _(rng):
    n = _dim(rng, 5, 12)

    def f(a):
        v, i = lax.top_k(a, 3)
        return v, i

    # distinct values so index ties can't differ between runtimes
    vals = rng.permutation(4 * n).astype(np.float32)
    return f, [vals.reshape(4, n)]


@case("dot_general")  # plain / batched / transposed contraction
def _(rng):
    def f(a, b, c):
        return (a @ b, jnp.einsum("bik,bkj->bij", c, jnp.swapaxes(c, 1, 2)),
                jnp.einsum("ik,jk->ij", a, jnp.swapaxes(b, 0, 1)))

    m, k, n = _dim(rng, 2), _dim(rng, 2), _dim(rng, 2)
    return f, [rng.standard_normal((m, k)).astype(np.float32),
               rng.standard_normal((k, n)).astype(np.float32),
               rng.standard_normal((2, m, k)).astype(np.float32)]


@case("conv")  # strided / grouped / dilated NHWC conv
def _(rng):
    ci, co, g = 4, 6, 2

    def f(x, w1, w2):
        dn = lax.conv_dimension_numbers(x.shape, w1.shape, ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(x, w1, (2, 1), "SAME", dimension_numbers=dn)
        dn2 = lax.conv_dimension_numbers(x.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
        z = lax.conv_general_dilated(x, w2, (1, 1), "VALID", rhs_dilation=(2, 2),
                                     dimension_numbers=dn2, feature_group_count=g)
        return y, z

    h = _dim(rng, 6, 10)
    return f, [rng.standard_normal((2, h, h, ci)).astype(np.float32),
               rng.standard_normal((3, 3, ci, co)).astype(np.float32) * 0.3,
               rng.standard_normal((3, 3, ci // g, co)).astype(np.float32) * 0.3]


@case("conv_transpose")  # lhs_dilation path (Proto upsample analog)
def _(rng):
    def f(x, w):
        dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        # ConvTranspose(k=2, s=2, p=0) as lax sees it: zero-interleave the
        # input and pad k-1 on both sides (string padding is rejected when
        # lhs_dilation is set, so spell it out).
        return lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                        lhs_dilation=(2, 2), dimension_numbers=dn)

    h = _dim(rng, 4, 7)
    return f, [rng.standard_normal((1, h, h, 3)).astype(np.float32),
               rng.standard_normal((2, 2, 3, 5)).astype(np.float32) * 0.4]


@case("pool")  # reduce_window max + sum (avg pool)
def _(rng):
    def f(x):
        mx = lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "SAME")
        sm = lax.reduce_window(x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
        return mx, sm

    h = _dim(rng, 5, 9)
    return f, [rng.standard_normal((2, h, h, 3)).astype(np.float32)]


@case("gather_fancy")  # int-array indexing + take_along_axis + jnp.take
def _(rng):
    n = _dim(rng, 4, 8)

    def f(a, i, j):
        return (a[i], jnp.take_along_axis(a, j, axis=1), jnp.take(a, i, axis=1),
                a[:, 1])

    return f, [rng.standard_normal((n, n)).astype(np.float32),
               rng.integers(0, n, (3,)).astype(np.int32),
               rng.integers(0, n, (n, 2)).astype(np.int32)]


@case("scatter_set")
def _(rng):
    n = _dim(rng, 4, 8)

    def f(a, i, v):
        return a.at[i].set(v), a.at[:, 0].set(0.0)

    idx = rng.permutation(n)[:3].astype(np.int32)  # unique rows: set is order-free
    return f, [rng.standard_normal((n, 4)).astype(np.float32), idx,
               rng.standard_normal((3, 4)).astype(np.float32)]


@case("dynamic_slice")
def _(rng):
    n = _dim(rng, 5, 9)

    def f(a, s):
        return lax.dynamic_slice(a, (s, jnp.int32(0)), (2, a.shape[1]))

    return f, [rng.standard_normal((n, 3)).astype(np.float32),
               np.int32(rng.integers(0, n - 1))]


@case("while_loop")
def _(rng):
    k = int(rng.integers(2, 6))

    def f(x):
        def cond(s):
            return s[0] < k

        def body(s):
            return s[0] + 1, s[1] * 1.5 + 0.1

        return lax.while_loop(cond, body, (jnp.int32(0), x))[1]

    return f, [rng.standard_normal((_dim(rng, 2), _dim(rng, 2))).astype(np.float32)]


# --- the tests ----------------------------------------------------------------


def test_fuzz_covers_full_handler_table():
    """Every registered lowering handler is exercised by at least one case."""
    rng = np.random.default_rng(0)
    covered = set()
    for label, make in CASES.items():
        fn, args = make(rng)
        covered |= _collect_prims(fn, [jnp.asarray(a) for a in args])
    missing = set(lower._HANDLERS) - covered
    # alias-only registrations: same handler object as a covered name, kept
    # for jaxpr-name compat across jax versions (e.g. "expand_dims" shares
    # the "squeeze" handler; no jax-0.9 construct emits the former).
    missing = {
        m for m in missing
        if not any(lower._HANDLERS[m] is lower._HANDLERS[c] for c in covered & set(lower._HANDLERS))
    }
    assert not missing, f"handlers with no fuzz case: {sorted(missing)}"


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("label", sorted(CASES))
def test_fuzz_op(label, seed, tmp_path):
    import zlib

    # stable per-label seed: hash() is randomized per process (PYTHONHASHSEED),
    # which would make a CI fuzz failure irreproducible locally
    rng = np.random.default_rng(seed * 1009 + zlib.crc32(label.encode()) % 1000)
    fn, args = CASES[label](rng)
    jargs = [jnp.asarray(a) for a in args]
    ref = fn(*jargs)
    refs = [np.asarray(r) for r in (ref if isinstance(ref, (tuple, list)) else [ref])]

    path = export_onnx(fn, jargs, tmp_path / f"{label}_{seed}.onnx")
    outs = OnnxModule(path)(*[np.asarray(a) for a in args])

    assert len(outs) == len(refs)
    for k, (r, o) in enumerate(zip(refs, outs)):
        assert tuple(r.shape) == tuple(o.shape), (label, k, r.shape, o.shape)
        if r.dtype.kind in "fc":
            np.testing.assert_allclose(
                np.asarray(o, r.dtype), r, rtol=1e-5, atol=1e-5,
                err_msg=f"{label} output {k}")
        else:
            np.testing.assert_array_equal(np.asarray(o), r, err_msg=f"{label} output {k}")

    # wire bytes: our codec must be a decode/encode fixed point
    blob = path.read_bytes()
    m1 = proto.decode(blob, "ModelProto")
    m2 = proto.decode(proto.encode(m1, "ModelProto"), "ModelProto")
    assert m1 == m2, f"{label}: protobuf codec round trip not a fixed point"


@pytest.mark.skipif(shutil.which("protoc") is None, reason="protoc not available")
@pytest.mark.parametrize("label", sorted(CASES))
def test_fuzz_protoc_decode(label, tmp_path):
    rng = np.random.default_rng(42)
    fn, args = CASES[label](rng)
    path = export_onnx(fn, [jnp.asarray(a) for a in args], tmp_path / f"{label}.onnx")
    res = subprocess.run(["protoc", "--decode_raw"], stdin=open(path, "rb"),
                         capture_output=True, timeout=120)
    assert res.returncode == 0, res.stderr[:500]
    assert res.stdout  # non-empty structural decode
