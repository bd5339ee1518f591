"""YOLO-World open-vocabulary model: parity + facade tests."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax.numpy as jnp

YAML = "bsyolo_tpu/cfg/models/v8/yolov8-world.yaml"


@pytest.fixture(scope="module", params=["yolov8-world.yaml", "yolov8-worldv2.yaml"])
def pair(request):
    import torch

    from ref_torch_model import build_ref_model
    from bsyolo_tpu.nn.model import build_model
    from bsyolo_tpu.utils.torch_weights import convert_state_dict

    torch.manual_seed(0)
    yaml = f"bsyolo_tpu/cfg/models/v8/{request.param}"
    ref, spec = build_ref_model(yaml, scale="n")
    ref.eval()
    model, variables = build_model(spec, img_size=128)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables, report = convert_state_dict(sd, variables, strict=True)
    return ref, spec, model, variables


class TestWorldParity:
    def test_param_count(self, pair):
        ref, spec, model, variables = pair
        from bsyolo_tpu.nn.model import count_params

        assert count_params(variables["params"]) == ref.num_params() - 16

    def test_forward_parity_with_text(self, pair, rng):
        import torch

        ref, spec, model, variables = pair
        txt = rng.normal(0, 1, (1, spec.nc, 512)).astype(np.float32)
        txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
        x = rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)
        with torch.no_grad():
            # eval-mode WorldDetect returns (decoded, raw per-level maps)
            _, feats_ref = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(txt))
        import jax

        feats = jax.jit(lambda v, xx, tt: model.apply(v, xx, train=False, text=tt))(
            variables, jnp.asarray(x), jnp.asarray(txt)
        )
        assert len(feats) == 3
        for f_jax, f_t in zip(feats, feats_ref):
            got = np.asarray(f_jax).transpose(0, 3, 1, 2)
            np.testing.assert_allclose(got, f_t.numpy(), rtol=2e-4, atol=5e-4)


class TestWorldFacade:
    def test_set_classes_default_hashed_embeddings(self):
        """set_classes without embeddings uses the bundled deterministic
        hashed n-gram embedder (offline open-vocab demo, VERDICT r2 #10)."""
        from bsyolo_tpu import YOLOWorld
        from bsyolo_tpu.utils.text_embed import hashed_text_embeddings

        m = YOLOWorld("yolov8-world.yaml")
        m.set_classes(["person", "bus"])  # no embeddings kwarg
        assert m.spec.nc == 2 and m.txt_feats.shape == (1, 2, 512)
        # deterministic: same names -> same vectors
        np.testing.assert_array_equal(
            hashed_text_embeddings(["person", "bus"]), hashed_text_embeddings(["person", "bus"])
        )
        e = hashed_text_embeddings(["person", "personn", "zebra"])
        np.testing.assert_allclose(np.linalg.norm(e, axis=-1), 1.0, rtol=1e-5)
        # lexically close names are closer than unrelated ones
        assert e[0] @ e[1] > e[0] @ e[2]
        img = np.random.default_rng(1).integers(0, 255, (96, 128, 3), np.uint8)
        res = m.predict(img, conf=0.0001, imgsz=96)
        assert len(res) == 1

    def test_set_classes_and_predict(self):
        from bsyolo_tpu import YOLOWorld

        m = YOLOWorld("yolov8-world.yaml")
        emb = np.random.default_rng(0).normal(0, 1, (3, 512)).astype(np.float32)
        m.set_classes(["person", "bus", "dog"], embeddings=emb)
        assert m.spec.nc == 3
        img = np.random.default_rng(1).integers(0, 255, (96, 128, 3), np.uint8)
        res = m.predict(img, conf=0.0001, imgsz=96)
        assert len(res) == 1
        if res[0].boxes is not None and len(res[0].boxes):
            assert res[0].boxes.cls.max() < 3

    def test_set_classes_from_npz_matches_direct(self, tmp_path):
        """A user-saved CLIP embedding npz reproduces set_classes semantics
        exactly (VERDICT r4 #7): same txt_feats, same predictions as passing
        the matrix directly; "/"-synonym names average their table rows."""
        from bsyolo_tpu import YOLOWorld
        from bsyolo_tpu.utils.text_embed import load_text_embeddings, resolve_text_embeddings

        rng = np.random.default_rng(0)
        vecs = {n: rng.normal(0, 1, (512,)).astype(np.float32)
                for n in ("person", "bus", "dog", "canine")}
        # layout 1: one array per name
        p1 = tmp_path / "clip1.npz"
        np.savez(p1, **vecs)
        # layout 2: names/vectors pair
        p2 = tmp_path / "clip2.npz"
        np.savez(p2, names=np.asarray(list(vecs)), vectors=np.stack(list(vecs.values())))
        assert set(load_text_embeddings(str(p1))) == set(load_text_embeddings(str(p2)))

        names = ["person", "bus", "dog/canine"]
        direct = np.stack([vecs["person"], vecs["bus"],
                           (vecs["dog"] + vecs["canine"]) / 2])
        for src in (str(p1), str(p2), vecs):
            got = resolve_text_embeddings(names, src)
            np.testing.assert_allclose(got, direct, rtol=1e-6)

        m_npz = YOLOWorld("yolov8-world.yaml")
        m_npz.set_classes(names, embeddings=str(p1))
        m_direct = YOLOWorld("yolov8-world.yaml")
        m_direct.set_classes(names, embeddings=direct)
        np.testing.assert_allclose(
            np.asarray(m_npz.txt_feats), np.asarray(m_direct.txt_feats), rtol=1e-6
        )
        img = np.random.default_rng(1).integers(0, 255, (96, 128, 3), np.uint8)
        r1 = m_npz.predict(img, conf=0.0001, imgsz=96)[0]
        r2 = m_direct.predict(img, conf=0.0001, imgsz=96)[0]
        if r1.boxes is not None and r2.boxes is not None:
            assert len(r1.boxes) == len(r2.boxes)
            if len(r1.boxes):
                np.testing.assert_allclose(
                    np.asarray(r1.boxes.xyxy), np.asarray(r2.boxes.xyxy), rtol=1e-4
                )

        # missing class name -> actionable error
        with pytest.raises(KeyError, match="zebra"):
            resolve_text_embeddings(["zebra"], str(p1))


class TestWorldTrain:
    def test_world_train_e2e(self, tmp_path):
        """WorldTrainer analog (reference models/yolo/world/train.py): the
        open-vocab graph fine-tunes on a close-set dataset — detection loss
        over contrastive logits against the dataset's class-name text
        embeddings — and reaches real mAP on the synthetic shapes set."""
        from pathlib import Path as _Path

        from bsyolo_tpu.model import YOLOWorld
        from test_e2e_train import make_synthetic_dataset

        data_yaml = make_synthetic_dataset(tmp_path / "ds")
        m = YOLOWorld(str(_Path(__file__).parent / "fixtures" / "tinyworld.yaml"))
        # 20 epochs: the torch-matching kaiming-uniform init (nn/modules.py
        # TORCH_INIT) converges a little later at this seed than the old
        # flax-default init; 14 was calibrated against the latter
        metrics = m.train(
            data=str(data_yaml), epochs=20, batch=8, imgsz=96, optimizer="SGD",
            lr0=0.02, warmup_epochs=1.0, close_mosaic=6, max_gt=32, amp=False,
            patience=100, nbs=8, project=str(tmp_path / "runs"), name="w",
        )
        assert metrics.box.map50 > 0.3, f"world train mAP50 {metrics.box.map50}"
        # facade invariant after train: raw graph + adopted dataset text
        assert m.txt_feats is not None and m.txt_feats.shape == (1, 2, 512)
        assert not hasattr(m.model, "model") or hasattr(m.model, "apply")
        assert m.overrides["names"][0] == "square"
        # and the trained open-vocab model still serves set_classes swaps
        img = np.random.default_rng(1).integers(0, 255, (96, 96, 3), np.uint8)
        res = m.predict(img, conf=0.0001, imgsz=96)
        assert len(res) == 1
        # ckpt roundtrip: the text matrix the model trained against is
        # embedded in the checkpoint and rebound on load — without it the
        # reloaded graph would score against placeholder text and collapse
        from bsyolo_tpu.model import YOLO as _Y

        reloaded = _Y(str(tmp_path / "runs" / "w" / "weights" / "best.ckpt"))
        assert reloaded.txt_feats is not None and reloaded.txt_feats.shape == (1, 2, 512)
        assert reloaded.spec.nc == 2 and reloaded.spec.names == ("square", "circle")
        m2 = reloaded.val(data=str(data_yaml), imgsz=96, batch=8)
        assert abs(float(m2.box.map50) - float(metrics.box.map50)) < 0.05, (
            float(m2.box.map50), float(metrics.box.map50),
        )


class TestWorldSharded:
    def test_world_train_step_sharded_matches_single(self, rng):
        """World train step (C2fAttn text-gated einsums + contrastive head)
        under the 8-device batch-sharded mesh reproduces the single-device
        loss — the text constant must broadcast, not shard."""
        import jax
        import jax.numpy as jnp

        from bsyolo_tpu.engine.optim import OptimConfig
        from bsyolo_tpu.engine.train_step import StepConfig, init_train_state, make_train_step
        from bsyolo_tpu.losses import DetectionLossConfig
        from bsyolo_tpu.nn import build_model, load_model_yaml, parse_model_yaml
        from bsyolo_tpu.nn.model import TextConditioned
        from bsyolo_tpu.parallel import make_mesh, replicated_sharding, shard_batch
        from bsyolo_tpu.utils.text_embed import hashed_text_embeddings

        d = load_model_yaml(str(Path(__file__).parent / "fixtures" / "tinyworld.yaml"))
        spec = parse_model_yaml(d, scale="")
        model, variables = build_model(spec, img_size=64)
        model = TextConditioned(model, jnp.asarray(hashed_text_embeddings(["square", "circle"])[None]))

        B, M = 8, 6
        cfg = StepConfig(
            loss=DetectionLossConfig(nc=2, strides=spec.head_strides),
            optim=OptimConfig(name="SGD", lr0=1e-2, epochs=1, nbs=B),
            batch_size=B, nb=1, nw=0, use_adamw=False, weight_decay=0.0,
        )
        step = make_train_step(model, cfg)
        g = np.random.default_rng(5)
        n_valid = (np.arange(B) % (M - 1)) + 1
        batch = {
            "img": g.uniform(0, 1, (B, 64, 64, 3)).astype(np.float32),
            "cls": g.integers(0, 2, (B, M)).astype(np.int32),
            "bboxes": np.concatenate(
                [g.uniform(0.3, 0.7, (B, M, 2)), g.uniform(0.1, 0.25, (B, M, 2))], -1
            ).astype(np.float32),
            "mask": (np.arange(M)[None] < n_valid[:, None]).astype(np.float32),
        }

        s1, m1 = step(init_train_state(variables), {k: jnp.asarray(v) for k, v in batch.items()})

        mesh = make_mesh(8)
        state0 = jax.device_put(init_train_state(variables), replicated_sharding(mesh))
        s2, m2 = step(state0, shard_batch(batch, mesh))

        assert np.isfinite(float(m1["loss"]))
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-5)
