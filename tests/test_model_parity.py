"""End-to-end model parity: JAX graph vs the reference torch blocks.

Builds the BS-YOLO yolo11n graph in both frameworks, converts the torch
weights to flax via the converter, and compares raw head maps and decoded
predictions. This is the M1 correctness gate (SURVEY.md section 7 milestone).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

YAML = "bsyolo_tpu/cfg/models/11/yolo11.yaml"


@pytest.fixture(scope="module")
def pair():
    import torch

    from ref_torch_model import build_ref_model
    from bsyolo_tpu.nn.model import build_model
    from bsyolo_tpu.utils.torch_weights import convert_state_dict

    from bsyolo_tpu.nn.model import make_forward

    torch.manual_seed(0)
    ref, spec = build_ref_model(YAML, scale="n")
    ref.eval()
    model, variables = build_model(spec, img_size=128)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables, report = convert_state_dict(sd, variables, strict=True)
    fwd = make_forward(model)
    return ref, spec, model, variables, fwd


class TestParamCount:
    def test_param_count_matches_reference(self, pair):
        ref, spec, model, variables, fwd = pair
        from bsyolo_tpu.nn.model import count_params

        ref_n = ref.num_params()
        got_n = count_params(variables["params"])
        # reference includes the 16-entry fixed (non-learnable) DFL projection
        assert got_n == ref_n - 16


class TestForwardParity:
    def test_raw_head_maps_match(self, pair, rng):
        import torch

        ref, spec, model, variables, fwd = pair
        x = rng.uniform(0, 1, size=(1, 128, 128, 3)).astype(np.float32)
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        with torch.no_grad():
            y_ref, feats_ref = ref(xt)  # eval mode: (decoded, raw list)
        feats = fwd(variables, jnp.asarray(x))
        assert len(feats) == len(feats_ref)
        for f_jax, f_t in zip(feats, feats_ref):
            got = np.asarray(f_jax).transpose(0, 3, 1, 2)
            np.testing.assert_allclose(got, f_t.numpy(), rtol=1e-4, atol=2e-4)

    def test_decoded_predictions_match(self, pair, rng):
        import torch

        ref, spec, model, variables, fwd = pair
        from bsyolo_tpu.nn.heads import decode_detections

        x = rng.uniform(0, 1, size=(1, 128, 128, 3)).astype(np.float32)
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        with torch.no_grad():
            y_ref, _ = ref(xt)  # (B, 4+nc, A)
        feats = fwd(variables, jnp.asarray(x))
        decoded = decode_detections(feats, spec.head_strides, spec.nc)  # (B, A, 4+nc)
        got = np.asarray(decoded).transpose(0, 2, 1)
        np.testing.assert_allclose(got, y_ref.numpy(), rtol=1e-4, atol=2e-4)


class TestGradients:
    def test_loss_gradient_flows(self, pair):
        ref, spec, model, variables, fwd = pair

        def loss_fn(params):
            feats = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                jnp.ones((1, 128, 128, 3)),
                train=False,
            )
            return sum(jnp.sum(f**2) for f in feats)

        g = jax.jit(jax.grad(loss_fn))(variables["params"])
        flat = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
        total = sum(float(jnp.sum(jnp.abs(x))) for x in flat)
        assert total > 0


class TestTaskGraphs:
    """All task-family graphs build and match reference parameter counts."""

    @pytest.mark.parametrize(
        "name,scale",
        [
            ("yolo11-seg.yaml", "n"),
            ("yolo11-pose.yaml", "n"),
            ("yolo11-obb.yaml", "n"),
            ("yolo11-cls.yaml", "n"),
            ("yolo11-stock.yaml", "n"),
            ("yolo11.yaml", "s"),
        ],
    )
    def test_param_parity(self, name, scale):
        from ref_torch_model import build_ref_model
        from test_zoo_all import shape_param_count

        path = f"bsyolo_tpu/cfg/models/11/{name}"
        ref, spec = build_ref_model(path, scale=scale)
        got = shape_param_count(spec)  # eval_shape: no compile (cold-host budget)
        want = ref.num_params()
        # reference counts include the fixed 16-entry DFL conv (absent for cls)
        dfl = 0 if spec.task == "classify" else 16
        assert got == want - dfl, f"{name}: {got} vs {want}"


class TestSegmentWeightImport:
    def test_seg_graph_forward_parity_after_conversion(self, rng):
        """Segment-head torch weights convert and reproduce raw map numerics."""
        import torch

        from ref_torch_model import build_ref_model
        from bsyolo_tpu.nn.model import build_model, make_forward
        from bsyolo_tpu.utils.torch_weights import convert_state_dict

        torch.manual_seed(0)
        ref, spec = build_ref_model("bsyolo_tpu/cfg/models/11/yolo11-seg.yaml", scale="n")
        ref.eval()
        model, variables = build_model(spec, img_size=64)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        variables, report = convert_state_dict(sd, variables, strict=True)

        x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        # reference Segment eval returns (decoded+coeffs, (feats, coeffs, proto))
        proto_ref = y_ref[1][2] if isinstance(y_ref, tuple) else None
        out = make_forward(model)(variables, jnp.asarray(x))
        assert set(out.keys()) == {"feats", "proto"}
        if proto_ref is not None:
            got = np.asarray(out["proto"]).transpose(0, 3, 1, 2)
            np.testing.assert_allclose(got, proto_ref.numpy(), rtol=1e-4, atol=2e-4)


class TestModelZooFamilies:
    """v5 / v8 / v9 graph parity (modules: C3, C2f, GELAN blocks)."""

    @pytest.mark.parametrize(
        "name,scale",
        [
            ("v5/yolov5.yaml", "n"),
            ("v8/yolov8-seg.yaml", "n"),
            ("v8/yolov8-p2.yaml", "n"),
            ("v8/yolov8-p6.yaml", "n"),
            ("v9/yolov9t.yaml", ""),
        ],
    )
    def test_param_parity(self, name, scale):
        from ref_torch_model import build_ref_model
        from test_zoo_all import shape_param_count

        path = f"bsyolo_tpu/cfg/models/{name}"
        ref, spec = build_ref_model(path, scale=scale)
        got = shape_param_count(spec)  # eval_shape: no compile (cold-host budget)
        want = ref.num_params()
        assert got == want - 16, f"{name}: {got} vs {want}"

    def test_v9t_forward_parity_after_conversion(self, rng):
        """GELAN modules (ELAN1/AConv/RepNCSPELAN4/SPPELAN) reproduce the
        reference numerics through converted weights."""
        import torch

        from ref_torch_model import build_ref_model
        from bsyolo_tpu.nn.model import build_model
        from bsyolo_tpu.utils.torch_weights import convert_state_dict

        torch.manual_seed(0)
        ref, spec = build_ref_model("bsyolo_tpu/cfg/models/v9/yolov9t.yaml", scale="", img_size=64)
        ref.eval()
        model, variables = build_model(spec, img_size=64)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        variables, report = convert_state_dict(sd, variables, strict=True)
        x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            _, ref_maps = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        import jax

        maps = jax.jit(lambda v, t: model.apply(v, t, train=False))(variables, jnp.asarray(x))
        for got, want in zip(maps, ref_maps):
            np.testing.assert_allclose(
                np.asarray(got).transpose(0, 3, 1, 2), want.numpy(), rtol=1e-3, atol=1e-4
            )


class TestYolov3:
    def test_param_parity_with_repeats(self):
        """Stacked plain Bottlenecks (Sequential repeat path) match torch."""
        from ref_torch_model import build_ref_model
        from test_zoo_all import shape_param_count

        ref, spec = build_ref_model("bsyolo_tpu/cfg/models/v3/yolov3.yaml", scale="", img_size=64)
        assert shape_param_count(spec) == ref.num_params() - 16


class TestYolov6:
    def test_forward_parity_with_relu_override(self, rng):
        """yolov6: global nn.ReLU() activation override + ConvTranspose neck
        must reproduce reference numerics via converted weights."""
        import torch

        from ref_torch_model import build_ref_model
        from bsyolo_tpu.nn.model import build_model
        from bsyolo_tpu.utils.torch_weights import convert_state_dict

        torch.manual_seed(0)
        ref, spec = build_ref_model("bsyolo_tpu/cfg/models/v6/yolov6.yaml", scale="n", img_size=64)
        ref.eval()
        assert spec.act == "relu"
        model, variables = build_model(spec, img_size=64)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        variables, report = convert_state_dict(sd, variables, strict=True)
        x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            _, ref_maps = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        import jax

        maps = jax.jit(lambda v, t: model.apply(v, t, train=False))(variables, jnp.asarray(x))
        for got, want in zip(maps, ref_maps):
            np.testing.assert_allclose(
                np.asarray(got).transpose(0, 3, 1, 2), want.numpy(), rtol=1e-3, atol=1e-4
            )


class TestYolov9e:
    def test_forward_parity_dual_backbone(self, rng):
        """CBLinear/CBFuse dual-backbone graph reproduces reference numerics."""
        import torch

        from ref_torch_model import build_ref_model
        from bsyolo_tpu.nn.model import build_model
        from bsyolo_tpu.utils.torch_weights import convert_state_dict

        torch.manual_seed(0)
        ref, spec = build_ref_model("bsyolo_tpu/cfg/models/v9/yolov9e.yaml", scale="", img_size=64)
        ref.eval()
        model, variables = build_model(spec, img_size=64)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        variables, report = convert_state_dict(sd, variables, strict=True)
        x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            _, ref_maps = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        import jax

        maps = jax.jit(lambda v, t: model.apply(v, t, train=False))(variables, jnp.asarray(x))
        for got, want in zip(maps, ref_maps):
            np.testing.assert_allclose(
                np.asarray(got).transpose(0, 3, 1, 2), want.numpy(), rtol=1e-3, atol=1e-4
            )
