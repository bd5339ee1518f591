"""YOLOv10 / end-to-end (NMS-free) path parity and training tests."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

YAML = "bsyolo_tpu/cfg/models/v10/yolov10.yaml"


@pytest.fixture(scope="module")
def pair():
    import torch

    from ref_torch_model import build_ref_model
    from bsyolo_tpu.nn.model import build_model, make_forward
    from bsyolo_tpu.utils.torch_weights import convert_state_dict

    torch.manual_seed(0)
    ref, spec = build_ref_model(YAML, scale="n")
    ref.eval()
    model, variables = build_model(spec, img_size=128)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables, report = convert_state_dict(sd, variables, strict=True)
    fwd = make_forward(model)
    return ref, spec, model, variables, fwd


class TestV10Parity:
    def test_param_count(self, pair):
        ref, spec, model, variables, fwd = pair
        from bsyolo_tpu.nn.model import count_params

        # torch includes the fixed 16-entry DFL projection conv
        assert count_params(variables["params"]) == ref.num_params() - 16

    def test_head_maps_and_e2e_output_match(self, pair, rng):
        import torch

        ref, spec, model, variables, fwd = pair
        from bsyolo_tpu.nn.heads import decode_detections, postprocess_e2e

        x = rng.uniform(0, 1, size=(1, 128, 128, 3)).astype(np.float32)
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        with torch.no_grad():
            y_ref, both = ref(xt)  # eval forward_end2end: (postprocessed, dict)
        out = fwd(variables, jnp.asarray(x))
        assert set(out) == {"one2many", "one2one"}
        for key in ("one2many", "one2one"):
            for f_jax, f_t in zip(out[key], both[key]):
                got = np.asarray(f_jax).transpose(0, 3, 1, 2)
                np.testing.assert_allclose(got, f_t.numpy(), rtol=1e-4, atol=2e-4)

        # score parity of the NMS-free selection on the real (converted)
        # weights; class/box identity is tie-broken arbitrarily on an
        # untrained net, so exact selection parity is tested separately below
        preds = decode_detections(out["one2one"], spec.head_strides, spec.nc)
        dets = np.asarray(postprocess_e2e(preds, max_det=300, nc=spec.nc))
        yr = y_ref.numpy()
        k = min(dets.shape[1], yr.shape[1])
        np.testing.assert_allclose(dets[:, :k, 4], yr[:, :k, 4], rtol=1e-4, atol=1e-5)

    def test_postprocess_matches_reference_on_random(self, rng):
        """postprocess_e2e vs AST-extracted Detect.postprocess on random
        tie-free scores: identical boxes, classes, and confidences."""
        import torch

        from ref_torch_model import _ns
        from bsyolo_tpu.nn.heads import postprocess_e2e

        nc, A, b = 7, 500, 2
        preds = rng.uniform(0, 1, (b, A, 4 + nc)).astype(np.float32)
        preds[..., :4] *= 100
        ref_out = _ns()["Detect"].postprocess(torch.from_numpy(preds.copy()), 50, nc).numpy()
        got = np.asarray(postprocess_e2e(jnp.asarray(preds), max_det=50, nc=nc))
        got_xywh = np.concatenate(
            [(got[..., 0:2] + got[..., 2:4]) / 2, got[..., 2:4] - got[..., 0:2]], axis=-1
        )
        np.testing.assert_allclose(got[..., 4], ref_out[..., 4], rtol=1e-6)
        np.testing.assert_array_equal(got[..., 5], ref_out[..., 5])
        np.testing.assert_allclose(got_xywh, ref_out[..., :4], rtol=1e-4, atol=1e-3)


class TestV10Training:
    def test_e2e_train_step_decreases_loss(self):
        from bsyolo_tpu.cfg import model_yaml_path
        from bsyolo_tpu.engine.optim import OptimConfig
        from bsyolo_tpu.engine.train_step import StepConfig, init_train_state, make_train_step
        from bsyolo_tpu.losses import DetectionLossConfig
        from bsyolo_tpu.losses.detect import detection_loss
        from bsyolo_tpu.nn import build_model, load_model_yaml, parse_model_yaml

        d = load_model_yaml(model_yaml_path("yolov10.yaml"))
        d["nc"] = 4
        spec = parse_model_yaml(d, scale="n")
        assert spec.head.module == "v10Detect"
        model, variables = build_model(spec, img_size=64)

        cfg = StepConfig(
            loss=DetectionLossConfig(nc=4, strides=spec.head_strides),
            optim=OptimConfig(name="SGD", lr0=0.01, epochs=1, nbs=4),
            batch_size=4, nb=4, nw=0, use_adamw=False, weight_decay=0.0,
        )

        def criterion(outputs, batch, ls, lc):
            t1, i1, new_ls = detection_loss(
                outputs["one2many"], batch["cls"], batch["bboxes"], batch["mask"], ls, lc
            )
            t2, i2, _ = detection_loss(
                outputs["one2one"], batch["cls"], batch["bboxes"], batch["mask"],
                ls, lc._replace(tal_topk=1),
            )
            return t1 + t2, i1 + i2, new_ls

        step = make_train_step(model, cfg, criterion=criterion)
        state = init_train_state(variables)
        rng = np.random.default_rng(0)
        M = 8
        batch = {
            "img": rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32),
            "cls": np.zeros((4, M), np.int32),
            "bboxes": np.tile(np.asarray([[0.5, 0.5, 0.4, 0.4]], np.float32), (4, M, 1)),
            "mask": np.pad(np.ones((4, 1), np.float32), ((0, 0), (0, M - 1))),
        }
        losses = []
        # loss RISES for dozens of steps while TAL assignments firm up (the
        # aligned-metric targets grow with the model's own IoU*cls scores —
        # measured peak ~step 35 at this seed under the torch-matching init),
        # then optimization wins: compare the tail to the peak, like
        # test_train_step does, instead of step0 (which is seed roulette)
        for _ in range(120):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-5:]) < 0.8 * np.max(losses)
