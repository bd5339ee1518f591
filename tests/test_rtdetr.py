"""RT-DETR family: parity vs the AST-extracted reference + training tests."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

YAML = "bsyolo_tpu/cfg/models/rt-detr/rtdetr-l.yaml"


def _tiny_spec(nc=4):
    """Scaled-down rtdetr graph for CPU-speed tests."""
    from bsyolo_tpu.nn import parse_model_yaml

    d = {
        "nc": nc,
        "scales": {"l": [1.0, 1.0, 1024]},
        "backbone": [
            [-1, 1, "HGStem", [8, 16]],
            [-1, 1, "HGBlock", [8, 32, 3]],
            [-1, 1, "DWConv", [32, 3, 2, 1, False]],
            [-1, 1, "HGBlock", [8, 32, 3]],
            [-1, 1, "DWConv", [32, 3, 2, 1, False]],
            [-1, 1, "HGBlock", [8, 32, 5, True, False]],
        ],
        "head": [
            [-1, 1, "Conv", [32, 1, 1, None, 1, 1, False]],
            [-1, 1, "AIFI", [32, 4]],
            [-1, 1, "Conv", [32, 1, 1]],  # 8 (P5)
            [-1, 1, "nn.Upsample", [None, 2, "nearest"]],
            [3, 1, "Conv", [32, 1, 1, None, 1, 1, False]],
            [[-2, -1], 1, "Concat", [1]],
            [-1, 1, "RepC3", [32]],  # 12 (P4)
            [-1, 1, "nn.Upsample", [None, 2, "nearest"]],
            [1, 1, "Conv", [32, 1, 1, None, 1, 1, False]],
            [[-2, -1], 1, "Concat", [1]],
            [-1, 1, "RepC3", [32]],  # 16 (P3)
            [[16, 12, 8], 1, "RTDETRDecoder", [nc]],
        ],
    }
    return parse_model_yaml(d, scale="l")


class TestRTDETRParity:
    @pytest.fixture(scope="class")
    def pair(self):
        import torch

        from ref_torch_model import build_ref_model
        from bsyolo_tpu.nn.model import build_model
        from bsyolo_tpu.utils.torch_weights import convert_state_dict

        torch.manual_seed(0)
        ref, spec = build_ref_model(YAML, scale="l", img_size=128)
        ref.eval()
        model, variables = build_model(spec, img_size=128)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        variables, report = convert_state_dict(sd, variables, strict=True)
        return ref, spec, model, variables

    def test_param_count(self, pair):
        ref, spec, model, variables = pair
        from bsyolo_tpu.nn.model import count_params

        # RTDETRDecoder has no DFL conv; counts should match exactly
        assert count_params(variables["params"]) == ref.num_params()

    def test_eval_forward_parity(self, pair, rng):
        import torch

        ref, spec, model, variables = pair
        x = rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)
        with torch.no_grad():
            y_ref, _ = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        out = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(variables, jnp.asarray(x))
        got = np.concatenate(
            [
                np.asarray(out["dec_bboxes"])[-1],
                jax.nn.sigmoid(np.asarray(out["dec_scores"])[-1].astype(np.float32)),
            ],
            axis=-1,
        )[0]
        ref_np = y_ref.numpy().reshape(got.shape)
        # with an untrained net the encoder scores are nearly tied, so
        # torch.topk and lax.top_k order the selected queries differently;
        # compare as a SET of query rows via optimal assignment
        from scipy.optimize import linear_sum_assignment

        cost = np.abs(got[:, None, :] - ref_np[None, :, :]).sum(-1)
        r, c = linear_sum_assignment(cost)
        per_row = cost[r, c] / got.shape[1]
        assert per_row.mean() < 5e-4, per_row.mean()
        assert per_row.max() < 5e-3, per_row.max()


class TestRTDETRTraining:
    def test_train_step_decreases_loss(self):
        from bsyolo_tpu.engine.optim import OptimConfig
        from bsyolo_tpu.engine.train_step import StepConfig, init_train_state, make_train_step
        from bsyolo_tpu.losses import DetectionLossConfig
        from bsyolo_tpu.losses.detr import rtdetr_loss
        from bsyolo_tpu.nn import build_model

        spec = _tiny_spec()
        model, variables = build_model(spec, img_size=64)
        cfg = StepConfig(
            loss=DetectionLossConfig(nc=4, strides=spec.head_strides),
            optim=OptimConfig(name="AdamW", lr0=1e-4, epochs=1, nbs=2),
            batch_size=2, nb=4, nw=0, use_adamw=True, weight_decay=0.0,
            pass_targets=True,
        )

        def criterion(outputs, batch, ls, lc):
            total, items = rtdetr_loss(outputs, batch["cls"], batch["bboxes"], batch["mask"])
            return total, items, ls

        step = make_train_step(model, cfg, criterion=criterion,
                               item_names=("cls_loss", "bbox_loss", "giou_loss"))
        state = init_train_state(variables)
        rng = np.random.default_rng(0)
        M = 6
        batch = {
            "img": rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32),
            "cls": np.zeros((2, M), np.int32),
            "bboxes": np.tile(np.asarray([[0.5, 0.5, 0.4, 0.4]], np.float32), (2, M, 1)),
            "mask": np.pad(np.ones((2, 2), np.float32), ((0, 0), (0, M - 2))),
        }
        losses = []
        for _ in range(6):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert np.all(np.isfinite(losses)), losses
        assert losses[-1] < losses[0], losses

    def test_predict_and_val_paths(self):
        from bsyolo_tpu.engine.predictor import DetectionPredictor
        from bsyolo_tpu.nn import build_model

        spec = _tiny_spec()
        model, variables = build_model(spec, img_size=64)
        pred = DetectionPredictor(model, spec, variables, conf=0.0, imgsz=64)
        img = np.random.default_rng(0).integers(0, 255, (48, 64, 3), np.uint8)
        res = pred([img])
        assert len(res) == 1


class TestRTDETRResNet:
    def test_resnet50_param_parity(self):
        from ref_torch_model import build_ref_model
        from bsyolo_tpu.nn.model import build_model, count_params

        ref, spec = build_ref_model(
            "bsyolo_tpu/cfg/models/rt-detr/rtdetr-resnet50.yaml", scale="l", img_size=128
        )
        model, variables = build_model(spec, img_size=128)
        assert count_params(variables["params"]) == ref.num_params()
