"""Self-contained ONNX export + runtime (bsyolo_tpu/onnx).

Covers: the protobuf wire codec (round trip incl. negative ints and packed
repeated fields), per-primitive lowering parity (each jax primitive family
exported and re-executed by the independent numpy evaluator), the full
yolo11n predict-path export, the exporter/AutoBackend wiring, and — when
protoc is available — structural validation of the emitted bytes.

Reference anchor: engine/exporter.py:463 (export_onnx) — the reference's
default ONNX artifact is the decode-only graph; NMS runs consumer-side.
"""

import shutil
import subprocess

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from bsyolo_tpu.onnx import OnnxModule, export_onnx  # noqa: E402
from bsyolo_tpu.onnx import proto  # noqa: E402


# --- wire codec -------------------------------------------------------------


def test_proto_roundtrip():
    model = {
        "ir_version": 8,
        "producer_name": "bsyolo_tpu",
        "opset_import": [{"domain": "", "version": 13}],
        "graph": {
            "name": "g",
            "node": [
                {
                    "input": ["x", "w"],
                    "output": ["y"],
                    "op_type": "Conv",
                    "attribute": [
                        {"name": "pads", "ints": [1, 1, -2, 3], "type": proto.ATTR_INTS},
                        {"name": "alpha", "f": 0.25, "type": proto.ATTR_FLOAT},
                        {"name": "mode", "s": b"constant", "type": proto.ATTR_STRING},
                        {"name": "scales", "floats": [0.5, -1.5], "type": proto.ATTR_FLOATS},
                    ],
                }
            ],
            "initializer": [proto.tensor_from_numpy(np.arange(6, dtype=np.float32).reshape(2, 3), "w")],
            "input": [
                {
                    "name": "x",
                    "type": {"tensor_type": {"elem_type": 1, "shape": {"dim": [{"dim_value": 2}]}}},
                }
            ],
            "output": [{"name": "y", "type": {"tensor_type": {"elem_type": 1}}}],
        },
    }
    blob = proto.encode(model, "ModelProto")
    back = proto.decode(blob, "ModelProto")
    assert back["ir_version"] == 8
    assert back["opset_import"][0]["version"] == 13
    node = back["graph"]["node"][0]
    assert node["op_type"] == "Conv" and node["input"] == ["x", "w"]
    attrs = {a["name"]: a for a in node["attribute"]}
    assert attrs["pads"]["ints"] == [1, 1, -2, 3]  # negative int64 varint survives
    assert attrs["alpha"]["f"] == pytest.approx(0.25)
    assert attrs["mode"]["s"] == b"constant"
    assert attrs["scales"]["floats"] == pytest.approx([0.5, -1.5])
    w = proto.tensor_to_numpy(back["graph"]["initializer"][0])
    np.testing.assert_array_equal(w, np.arange(6, dtype=np.float32).reshape(2, 3))


# --- per-primitive lowering parity -------------------------------------------


def _roundtrip(fn, *args, atol=1e-5):
    args = [jnp.asarray(a) for a in args]
    ref = fn(*args)
    refs = [np.asarray(r) for r in (ref if isinstance(ref, (tuple, list)) else [ref])]
    path = export_onnx(fn, args, "/tmp/prim_test.onnx")
    outs = OnnxModule(path)(*[np.asarray(a) for a in args])
    assert len(outs) == len(refs)
    for r, o in zip(refs, outs):
        assert r.shape == o.shape, (r.shape, o.shape)
        np.testing.assert_allclose(r, np.asarray(o, r.dtype), atol=atol, rtol=1e-5)


RNG = np.random.RandomState(7)


def test_prim_elementwise_and_activations():
    x = RNG.randn(2, 5).astype(np.float32)
    y = RNG.rand(2, 5).astype(np.float32) + 0.5
    _roundtrip(
        lambda a, b: jax.nn.silu(a) + jnp.sqrt(b) * jnp.tanh(a) - jnp.abs(a) / b
        + jnp.maximum(a, b) + jnp.minimum(a, b) + jnp.exp(-jnp.square(a)) + jax.lax.rsqrt(b),
        x, y,
    )


def test_prim_reduce_and_arg():
    x = RNG.randn(3, 4, 5).astype(np.float32)
    _roundtrip(lambda a: (jnp.sum(a, axis=(0, 2)), jnp.max(a, axis=1), jnp.argmax(a, axis=2)), x)


def test_prim_shape_ops():
    x = RNG.randn(2, 3, 4).astype(np.float32)
    _roundtrip(
        lambda a: (
            jnp.transpose(a, (2, 0, 1)).reshape(4, 6),
            jnp.concatenate([a, a * 2], axis=1)[:, 1:5:2, ::-1],
            jnp.broadcast_to(a[:, :1, :], (2, 3, 4)),
            jnp.flip(a, axis=2),
        ),
        x,
    )


def test_prim_pad_and_clamp():
    x = RNG.randn(2, 3).astype(np.float32)
    _roundtrip(
        lambda a: (
            jnp.pad(a, ((1, 2), (0, 1)), constant_values=-1.0),
            jax.lax.pad(a, 0.0, ((0, -1, 0), (1, 0, 0))),  # negative pad = crop
            jnp.clip(a, -0.5, 0.5),
        ),
        x,
    )


def test_prim_matmul_family():
    a = RNG.randn(2, 3, 4).astype(np.float32)
    b = RNG.randn(2, 4, 5).astype(np.float32)
    w = RNG.randn(4, 6).astype(np.float32)
    _roundtrip(
        lambda x, y: (jnp.einsum("bij,bjk->bik", x, y), x @ w, jnp.einsum("bij,bik->bjk", x, x)),
        a, b,
    )


def test_prim_conv_depthwise_strided_dilated():
    import flax.linen as nn

    x = RNG.randn(1, 9, 9, 6).astype(np.float32)
    conv = nn.Conv(8, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    dw = nn.Conv(6, (3, 3), feature_group_count=6, kernel_dilation=(2, 2), padding="SAME")
    v1 = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    v2 = dw.init(jax.random.PRNGKey(1), jnp.asarray(x))
    _roundtrip(lambda a: conv.apply(v1, dw.apply(v2, a)), x, atol=1e-4)


def test_prim_conv_transpose():
    import flax.linen as nn

    x = RNG.randn(1, 5, 5, 4).astype(np.float32)
    up = nn.ConvTranspose(3, (2, 2), strides=(2, 2))
    v = up.init(jax.random.PRNGKey(2), jnp.asarray(x))
    _roundtrip(lambda a: up.apply(v, a), x, atol=1e-4)


def test_prim_gather_take_along_axis():
    x = RNG.randn(2, 20, 7).astype(np.float32)
    idx = RNG.randint(0, 20, size=(2, 5)).astype(np.int32)
    _roundtrip(
        lambda a, i: jnp.take_along_axis(a, jnp.maximum(i, 0)[..., None], axis=1),
        x, idx,
    )
    # 4-d variant (pose keypoints selection pattern)
    k = RNG.randn(2, 20, 17, 3).astype(np.float32)
    _roundtrip(
        lambda a, i: jnp.take_along_axis(a, jnp.maximum(i, 0)[..., None, None], axis=1),
        k, idx,
    )


def test_prim_gather_take():
    x = RNG.randn(6, 4).astype(np.float32)
    idx = np.asarray([5, 0, 3], np.int32)
    _roundtrip(lambda a, i: jnp.take(a, i, axis=0), x, idx)


def test_prim_dynamic_slice_and_scatter():
    x = RNG.randn(2, 8, 6).astype(np.float32)
    j = np.asarray(3, np.int32)
    _roundtrip(
        lambda a, i: jax.lax.dynamic_slice(a, (jnp.asarray(0), i, jnp.asarray(0)), (2, 2, 6)),
        x, j,
    )
    u = RNG.randn(2, 8).astype(np.float32)
    _roundtrip(lambda a, up, i: a.at[:, :, i].set(up), x, u, j)


def test_prim_sincos():
    x = RNG.randn(3, 4).astype(np.float32)
    _roundtrip(lambda a: (jnp.sin(a), jnp.cos(a) * jnp.sin(a)), x)


def test_prim_maxpool():
    x = RNG.randn(1, 8, 8, 3).astype(np.float32)
    _roundtrip(
        lambda a: (
            jax.lax.reduce_window(a, -jnp.inf, jax.lax.max, (1, 5, 5, 1), (1, 1, 1, 1), "SAME"),
            jax.lax.reduce_window(a, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"),
        ),
        x,
    )


def test_prim_topk_where_cast():
    x = RNG.randn(2, 10).astype(np.float32)

    def f(a):
        v, i = jax.lax.top_k(a, 4)
        return v, i.astype(jnp.float32), jnp.where(a > 0, a, -a), jnp.cumsum(a, axis=1)

    _roundtrip(f, x)


def test_unsupported_primitive_message():
    from bsyolo_tpu.onnx.lower import UnsupportedPrimitive

    x = jnp.arange(6.0).reshape(2, 3)
    with pytest.raises(UnsupportedPrimitive, match="sort"):
        export_onnx(lambda a: jnp.sort(a, axis=1), [x], "/tmp/unsup.onnx")


# --- full model export --------------------------------------------------------


@pytest.fixture(scope="module")
def yolo11n_onnx(tmp_path_factory):
    from bsyolo_tpu.model import YOLO
    from bsyolo_tpu.nn.heads import decode_detections

    y = YOLO("yolo11n.yaml")
    spec, model, variables = y.spec, y.model, y.variables

    def predict(x):
        feats = model.apply(variables, x, train=False)
        return decode_detections(feats, spec.head_strides, spec.nc)

    x = RNG.rand(1, 96, 96, 3).astype(np.float32)
    ref = np.asarray(predict(jnp.asarray(x)))
    path = tmp_path_factory.mktemp("onnx") / "yolo11n.onnx"
    export_onnx(predict, [jnp.asarray(x)], path, input_names=["images"], output_names=["output0"])
    return path, x, ref


def test_yolo11n_export_parity(yolo11n_onnx):
    path, x, ref = yolo11n_onnx
    m = OnnxModule(path)
    assert m.opset == 13
    assert m.input_names == ["images"] and m.output_names == ["output0"]
    out = m(x)[0]
    assert out.shape == ref.shape
    np.testing.assert_allclose(ref, out, atol=2e-4, rtol=1e-3)


@pytest.mark.skipif(shutil.which("protoc") is None, reason="protoc not available")
def test_protoc_decode_raw(yolo11n_onnx):
    path, _, _ = yolo11n_onnx
    res = subprocess.run(
        ["protoc", "--decode_raw"], stdin=open(path, "rb"), capture_output=True, timeout=120
    )
    assert res.returncode == 0, res.stderr[:500]
    text = res.stdout.decode(errors="replace")
    # ModelProto field 7 = graph; field 8 = opset_import
    assert text.startswith("1: 8"), text[:80]
    assert "\n7 {" in text and "\n8 {" in text


def test_exporter_and_backend_wiring(tmp_path):
    from bsyolo_tpu.engine.backend import AutoBackend
    from bsyolo_tpu.model import YOLO

    y = YOLO("yolo11n.yaml")
    out = y.export(format="onnx", imgsz=96, output=str(tmp_path / "m.onnx"))
    assert out.endswith(".onnx")
    meta = (tmp_path / "m.onnx.json").read_text()
    assert '"opset": 13' in meta

    backend = AutoBackend(out, imgsz=96)
    x = RNG.rand(1, 96, 96, 3).astype(np.float32)
    got = backend.forward(x)

    ref_backend = AutoBackend("yolo11n.yaml", imgsz=96)
    # fresh yaml init differs from y's params; compare shapes + dtype contract
    assert got.shape == ref_backend.forward(x).shape
    assert got.dtype == np.float32

    # numeric parity against the exporting model itself
    import jax.numpy as jnp

    from bsyolo_tpu.nn.heads import decode_detections

    feats = y.model.apply(y.variables, jnp.asarray(x), train=False)
    ref = np.asarray(decode_detections(feats, y.spec.head_strides, y.spec.nc))
    np.testing.assert_allclose(ref, got, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize(
    "yaml_name,n_outputs",
    [
        ("yolo11-seg.yaml", 2),  # preds+coeffs, proto
        ("yolo11-pose.yaml", 1),
        ("yolo11-obb.yaml", 1),
        ("yolo11-cls.yaml", 1),
        ("yolov10n.yaml", 1),  # NMS-free e2e postprocess baked (top_k+gather)
    ],
)
@pytest.mark.slow
def test_task_export_parity(yaml_name, n_outputs, tmp_path):
    """Every task family exports to ONNX with numeric parity vs the JAX
    predict closure (reference exporter covers all tasks, engine/exporter.py:302)."""
    from bsyolo_tpu.engine.exporter import _build_export_predict
    from bsyolo_tpu.model import YOLO

    y = YOLO(yaml_name)
    predict, _ = _build_export_predict(y.spec, y.model, y.variables, False)
    x = RNG.rand(1, 96, 96, 3).astype(np.float32)
    ref = predict(jnp.asarray(x))
    refs = [np.asarray(r) for r in (ref if isinstance(ref, (tuple, list)) else [ref])]
    out = y.export(format="onnx", imgsz=96, output=str(tmp_path / "m.onnx"))
    got = OnnxModule(out)(x)
    assert len(got) == len(refs) == n_outputs
    for r, g in zip(refs, got):
        assert r.shape == g.shape
        np.testing.assert_allclose(r, g, atol=5e-4, rtol=1e-3)


def test_prim_while_loop():
    def f(a):
        def body(s):
            i, x = s
            return i + 1, x * 1.5 + 1.0

        i, x = jax.lax.while_loop(lambda s: s[0] < 5, body, (jnp.asarray(0, jnp.int32), a))
        return x + i.astype(jnp.float32)

    _roundtrip(f, RNG.randn(2, 3).astype(np.float32))


def test_nms_export_parity():
    """The exact-greedy NMS (vmapped fixed-point while loop) lowers to an
    ONNX Loop subgraph with bit-exact output (ops/nms.py)."""
    from bsyolo_tpu.ops.nms import non_max_suppression

    preds = np.concatenate(
        [
            RNG.uniform(10, 80, (2, 189, 2)),
            RNG.uniform(5, 30, (2, 189, 2)),
            RNG.beta(0.4, 3.0, (2, 189, 12)),
        ],
        axis=-1,
    ).astype(np.float32)
    _roundtrip(
        lambda p: non_max_suppression(p, conf_thres=0.25, iou_thres=0.5, max_det=20),
        preds,
        atol=1e-4,
    )


@pytest.mark.slow
def test_artifact_val_matches_live(tmp_path):
    """YOLO('best.onnx').val() (reference `yolo val model=best.onnx`): a
    trained model's exported ONNX artifact validates to the same mAP as the
    live graph (backend.validate_artifact over the bundled numpy runtime)."""
    from pathlib import Path as _Path

    from bsyolo_tpu.engine.trainer import DetectionTrainer
    from bsyolo_tpu.model import YOLO
    from test_e2e_train import make_synthetic_dataset

    data_yaml = make_synthetic_dataset(tmp_path / "ds")
    tiny = str(_Path(__file__).parent / "fixtures" / "tiny.yaml")
    trainer = DetectionTrainer(
        overrides={
            "model": tiny, "data": str(data_yaml), "epochs": 16, "batch": 8,
            "imgsz": 96, "optimizer": "SGD", "lr0": 0.02, "warmup_epochs": 1.0,
            "close_mosaic": 6, "project": str(tmp_path / "runs"), "name": "t",
            "max_gt": 32, "amp": False, "patience": 100, "nbs": 8,
        }
    )
    trainer.train()
    y = YOLO(str(tmp_path / "runs" / "t" / "weights" / "best.ckpt"))
    live = y.val(data=str(data_yaml), batch=8, imgsz=96)
    art = y.export(format="onnx", imgsz=96, batch=8, output=str(tmp_path / "best.onnx"))
    onnx_metrics = YOLO(art).val(data=str(data_yaml), imgsz=96)
    live50, art50 = live.box.map50, onnx_metrics.box.map50
    assert art50 > 0.5, f"artifact mAP50 {art50}"
    assert abs(live50 - art50) < 0.08, (live50, art50)


@pytest.mark.slow
def test_rtdetr_export_parity(tmp_path):
    """RT-DETR (HGNetv2 + AIFI + deformable decoder) lowers end to end:
    MSDeformAttn gathers, erfc (GELU), dynamic_slice, scalar-index scatter."""
    import jax.numpy as jnp2

    from bsyolo_tpu.engine.exporter import _build_export_predict
    from bsyolo_tpu.model import RTDETR

    y = RTDETR("rtdetr-l.yaml")
    predict, _ = _build_export_predict(y.spec, y.model, y.variables, False)
    x = RNG.rand(1, 96, 96, 3).astype(np.float32)
    ref = np.asarray(predict(jnp2.asarray(x)))
    out = y.export(format="onnx", imgsz=96, output=str(tmp_path / "rtdetr.onnx"))
    got = OnnxModule(out)(x)[0]
    assert got.shape == ref.shape == (1, 300, 6)
    np.testing.assert_allclose(ref, got, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_world_export_parity(tmp_path):
    """YOLOWorld exports with the set_classes text embeddings baked in."""
    import jax.numpy as jnp2

    from bsyolo_tpu.engine.exporter import _build_export_predict
    from bsyolo_tpu.model import YOLOWorld, _TextConditioned

    w = YOLOWorld("yolov8s-world.yaml")
    w.set_classes(["person", "bus", "car"])
    predict, _ = _build_export_predict(
        w.spec, _TextConditioned(w.model, w.txt_feats), w.variables, False
    )
    x = RNG.rand(1, 96, 96, 3).astype(np.float32)
    ref = np.asarray(predict(jnp2.asarray(x)))
    out = w.export(format="onnx", imgsz=96, output=str(tmp_path / "world.onnx"))
    got = OnnxModule(out)(x)[0]
    assert got.shape == ref.shape  # (1, A, 4+3): nc = len(set_classes)
    np.testing.assert_allclose(ref, got, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_export_nms_e2e(tmp_path):
    """nms=True ONNX export: forward + decode + NMS in one artifact."""
    import jax.numpy as jnp2

    from bsyolo_tpu.engine.exporter import _build_export_predict
    from bsyolo_tpu.model import YOLO

    y = YOLO("yolo11n.yaml")
    predict, desc = _build_export_predict(y.spec, y.model, y.variables, True)
    assert "6" in desc
    x = RNG.rand(1, 96, 96, 3).astype(np.float32)
    ref = np.asarray(predict(jnp2.asarray(x)))
    out = y.export(format="onnx", imgsz=96, nms=True, output=str(tmp_path / "e2e.onnx"))
    got = OnnxModule(out)(x)[0]
    assert got.shape == ref.shape == (1, 300, 6)
    np.testing.assert_allclose(ref, got, atol=5e-4, rtol=1e-3)


def test_artifact_val_rejects_non_detect(tmp_path):
    """Task guard: a segment export must refuse artifact val with a clear
    error (its (4+nc+nm) layout would otherwise NMS mask coefficients as
    class scores and report silently wrong mAP)."""
    from pathlib import Path

    from bsyolo_tpu.model import YOLO

    m = YOLO(str(Path(__file__).parent / "fixtures" / "tinyseg.yaml"))
    art = m.export(format="onnx", imgsz=96, output=str(tmp_path / "seg.onnx"))
    with pytest.raises(ValueError, match="detect-family"):
        YOLO(art).val(data=str(Path(__file__).parent / "fixtures" / "bsyolo8" / "bsyolo8.yaml"))


@pytest.mark.parametrize(
    "yaml_name",
    [
        "yolo11.yaml",       # the BS fork graph: PMSFA/C3k2_gai, SCDown, MSCA, ELA
        "yolov9t.yaml",      # GELAN: RepNCSPELAN4/AConv/SPPELAN
        "yolov8-ghost.yaml", # GhostConv/GhostBottleneck/C3Ghost
        "yolov6.yaml",       # ConvTranspose upsampling
        "yolov3-tiny.yaml",  # MaxPool2d/ZeroPad2d graph layers
    ],
)
@pytest.mark.slow
def test_family_export_parity(yaml_name, tmp_path):
    """Architecture families beyond the yolo11 task heads export to ONNX with
    numeric parity — the primitive-level lowering claim (docs/architecture.md)
    checked on the fork graph, GELAN, Ghost, ConvTranspose, and MaxPool
    module sets."""
    from bsyolo_tpu.engine.exporter import _build_export_predict
    from bsyolo_tpu.model import YOLO

    y = YOLO(yaml_name)
    predict, _ = _build_export_predict(y.spec, y.model, y.variables, False)
    x = RNG.rand(1, 64, 64, 3).astype(np.float32)
    ref = np.asarray(predict(jnp.asarray(x)))
    out = y.export(format="onnx", imgsz=64, output=str(tmp_path / "m.onnx"))
    (got,) = OnnxModule(out)(x)
    assert ref.shape == got.shape
    np.testing.assert_allclose(ref, got, atol=5e-4, rtol=1e-3)


def test_prim_avgpool():
    def f(a):
        import flax.linen as fnn

        return fnn.avg_pool(a, (2, 2), strides=(2, 2), padding=((1, 0), (0, 1)))

    _roundtrip(f, RNG.randn(2, 7, 7, 3).astype(np.float32))


@pytest.mark.parametrize("yaml_name", ["tinyseg.yaml", "tinypose.yaml"])
def test_export_closure_box_layout_with_extras(yaml_name):
    """The segment/pose export closures must split the head maps at
    4*reg_max, NOT infer the split from the channel count: those maps carry
    extra trailing channels (mask coeffs / keypoints), so inference from
    C - nc mis-reads box logits. Non-circular ground truth: decode the same
    maps with the extras sliced off. Regression for a real round-4 bug."""
    from pathlib import Path

    from bsyolo_tpu.engine.exporter import _build_export_predict
    from bsyolo_tpu.model import YOLO
    from bsyolo_tpu.nn.heads import decode_detections

    y = YOLO(str(Path(__file__).parent / "fixtures" / yaml_name))
    nc = y.spec.nc
    predict, _ = _build_export_predict(y.spec, y.model, y.variables, False)
    x = RNG.rand(1, 96, 96, 3).astype(np.float32)
    out = predict(jnp.asarray(x))
    preds = np.asarray(out[0] if isinstance(out, (tuple, list)) else out)

    feats = y.model.apply(y.variables, jnp.asarray(x), train=False)
    if isinstance(feats, dict):
        feats = feats["feats"]
    sliced = [f[..., : 4 * 16 + nc] for f in feats]  # extras removed
    want = np.asarray(decode_detections(sliced, y.spec.head_strides, nc))
    np.testing.assert_allclose(preds[..., : 4 + nc], want, atol=1e-5, rtol=1e-5)
