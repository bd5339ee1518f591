"""SAM family: parity vs AST-extracted reference + predictor functional tests."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp


def _small_flax_sam():
    from bsyolo_tpu.models.sam.modules import SAMModel

    return SAMModel(
        img_size=128, encoder_embed_dim=64, encoder_depth=2, encoder_num_heads=2,
        encoder_global_attn_indexes=(1,), encoder_window_size=4, prompt_embed_dim=32,
        decoder_mlp_dim=64, decoder_num_heads=2, iou_head_hidden_dim=32,
        pretrain_img_size=128,
    )


class TestSAMParity:
    @pytest.fixture(scope="class")
    def pair(self):
        import torch

        from ref_sam_model import build_ref_sam
        from bsyolo_tpu.utils.torch_weights import convert_state_dict

        ref = build_ref_sam(img_size=128, embed_dim=64, depth=2, num_heads=2,
                            global_attn_indexes=(1,), prompt_dim=32, window_size=4)
        # keep the 8x8 pos table un-interpolated (forward checks img_size!=1024)
        ref.image_encoder.img_size = 1024
        with torch.no_grad():
            ref.image_encoder.pos_embed.normal_(0, 0.02)
            for blk in ref.image_encoder.blocks:
                blk.attn.rel_pos_h.normal_(0, 0.02)
                blk.attn.rel_pos_w.normal_(0, 0.02)
        model = _small_flax_sam()
        x = jnp.zeros((1, 128, 128, 3), jnp.float32)
        c = jnp.zeros((1, 3, 2), jnp.float32)
        l = -jnp.ones((1, 3), jnp.int32)
        dm = jnp.zeros((1, 32, 32, 1), jnp.float32)
        variables = jax.jit(lambda k: model.init(k, x, c, l, True, dm))(jax.random.PRNGKey(0))
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        variables, report = convert_state_dict(sd, variables, strict=True)
        return ref, model, variables

    def test_param_count(self, pair):
        ref, model, variables = pair
        from bsyolo_tpu.nn.model import count_params

        n_ref = sum(p.numel() for p in ref.parameters())
        n_ref += ref.prompt_encoder.pe_layer.positional_encoding_gaussian_matrix.numel()
        assert count_params(variables["params"]) == n_ref

    def test_point_prompt_parity(self, pair):
        import torch

        ref, model, variables = pair
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)
        pts = np.asarray([[[40.0, 60.0], [90.0, 30.0]]], np.float32)
        lab = np.asarray([[1, 0]], np.int64)
        with torch.no_grad():
            m_ref, iou_ref = ref(
                torch.from_numpy(x.transpose(0, 3, 1, 2)),
                points=(torch.from_numpy(pts), torch.from_numpy(lab)),
            )
        # reference pads ONE extra not-a-point when boxes are absent
        c = np.concatenate([pts, np.zeros((1, 1, 2), np.float32)], axis=1)
        l = np.concatenate([lab.astype(np.int32), -np.ones((1, 1), np.int32)], axis=1)
        masks, iou = jax.jit(lambda v, xx, cc, ll: model.apply(v, xx, cc, ll, True))(
            variables, jnp.asarray(x), jnp.asarray(c), jnp.asarray(l)
        )
        np.testing.assert_allclose(np.asarray(iou), iou_ref.numpy(), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(masks), m_ref.numpy(), rtol=2e-2, atol=2e-3)

    def test_box_prompt_parity(self, pair):
        import torch

        ref, model, variables = pair
        rng = np.random.default_rng(1)
        x = rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)
        box = np.asarray([[20.0, 30.0, 100.0, 110.0]], np.float32)
        with torch.no_grad():
            m_ref, iou_ref = ref(
                torch.from_numpy(x.transpose(0, 3, 1, 2)), boxes=torch.from_numpy(box)
            )
        c = box.reshape(1, 2, 2)
        l = np.asarray([[2, 3]], np.int32)
        masks, iou = jax.jit(lambda v, xx, cc, ll: model.apply(v, xx, cc, ll, True))(
            variables, jnp.asarray(x), jnp.asarray(c), jnp.asarray(l)
        )
        np.testing.assert_allclose(np.asarray(iou), iou_ref.numpy(), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(masks), m_ref.numpy(), rtol=2e-2, atol=2e-3)


class TestTinyViTParity:
    def test_forward_parity(self):
        import torch

        from ref_sam_model import build_ref_tinyvit
        from bsyolo_tpu.models.sam.tiny_encoder import TinyViT
        from bsyolo_tpu.utils.torch_weights import convert_state_dict

        # last dim must be in {320, 448, 576}: the reference PatchMerging
        # only uses stride 1 (keeping the i==3 resolution formula valid)
        # for those out_dims (tiny_encoder.py:199)
        dims, depths, heads, wins = (8, 12, 16, 320), (1, 1, 2, 1), (1, 2, 2, 10), (4, 4, 7, 4)
        ref = build_ref_tinyvit(128, dims, depths, heads, wins)
        with torch.no_grad():
            # xavier keeps activations O(1) through all stages — a flat small
            # std collapses them and the neck LN then amplifies f32 noise
            for p in ref.parameters():
                if p.ndim > 1:
                    torch.nn.init.xavier_uniform_(p)
        # TinyViT Attention caches `ab` (bias gather) at eval(); refresh it
        # after re-randomizing attention_biases
        ref.train()
        ref.eval()
        model = TinyViT(img_size=128, embed_dims=dims, depths=depths,
                        num_heads=heads, window_sizes=wins)
        x = jnp.zeros((1, 128, 128, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        sd = {
            k: v.detach().numpy()
            for k, v in ref.state_dict().items()
            if not k.startswith(("head", "norm_head"))  # classifier head unused by SAM
        }
        variables, report = convert_state_dict(sd, variables, strict=True)
        rng = np.random.default_rng(0)
        xin = rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(xin.transpose(0, 3, 1, 2)))
        y = jax.jit(model.apply)(variables, jnp.asarray(xin))
        np.testing.assert_allclose(
            np.asarray(y).transpose(0, 3, 1, 2), y_ref.numpy(), rtol=2e-3, atol=2e-4
        )


class TestSAMPredictor:
    @pytest.fixture(scope="class")
    def predictor(self):
        from bsyolo_tpu.models.sam.predict import SAMPredictor

        model = _small_flax_sam()
        x = jnp.zeros((1, 128, 128, 3), jnp.float32)
        c = jnp.zeros((1, 8, 2), jnp.float32)
        l = -jnp.ones((1, 8), jnp.int32)
        dm = jnp.zeros((1, 32, 32, 1), jnp.float32)
        variables = jax.jit(lambda k: model.init(k, x, c, l, True, dm))(jax.random.PRNGKey(0))
        return SAMPredictor(model, variables, img_size=128, max_points=8)

    def test_box_prompt(self, predictor):
        img = np.random.default_rng(0).integers(0, 255, (100, 128, 3), np.uint8)
        r = predictor.set_image(img)(bboxes=[[10, 10, 60, 60]])
        assert r.masks is not None
        assert r.masks.data.shape == (1, 100, 128)
        assert r.boxes.data.shape == (1, 6)

    def test_point_prompt_multi(self, predictor):
        img = np.random.default_rng(1).integers(0, 255, (128, 96, 3), np.uint8)
        r = predictor.set_image(img)(points=[[40, 40]], labels=[1], multimask_output=True)
        assert r.masks.data.shape == (3, 128, 96)

    def test_generate(self, predictor):
        img = np.random.default_rng(2).integers(0, 255, (128, 128, 3), np.uint8)
        r = predictor.set_image(img).generate(
            points_per_side=4, points_per_batch=16, conf_thres=-10.0,
            stability_score_thresh=0.0, max_masks=8,
        )
        assert r.masks is not None and len(r.masks.data) > 0

    def test_facade_build_dispatch(self):
        from bsyolo_tpu.models.sam.build import _BUILDERS

        assert {"sam_b.pt", "sam_l.pt", "sam_h.pt", "mobile_sam.pt",
                "sam2_t.pt", "sam2_b.pt", "sam2.1_l.pt"} <= set(_BUILDERS)


def _small_flax_sam2():
    from bsyolo_tpu.models.sam.sam2 import SAM2Model

    return SAM2Model(
        img_size=128, encoder_embed_dim=16, encoder_stages=(1, 1, 2, 1),
        encoder_num_heads=1, encoder_global_att_blocks=(3,),
        encoder_window_spec=(4, 4, 4, 4), encoder_window_spatial_size=(4, 4),
        encoder_backbone_channel_list=(128, 64, 32, 16), prompt_embed_dim=32,
        decoder_mlp_dim=64, decoder_num_heads=2, iou_head_hidden_dim=32,
    )


class TestSAM2Parity:
    @pytest.fixture(scope="class")
    def pair(self):
        import torch

        from ref_sam_model import build_ref_sam2
        from bsyolo_tpu.utils.torch_weights import convert_state_dict

        ref = build_ref_sam2(img_size=128, embed_dim=16, stages=(1, 1, 2, 1),
                             num_heads=1, global_att_blocks=(3,),
                             window_spec=(4, 4, 4, 4), window_spatial_size=(4, 4),
                             prompt_dim=32)
        with torch.no_grad():
            ref.trunk.pos_embed.normal_(0, 0.02)
            ref.trunk.pos_embed_window.normal_(0, 0.02)
        model = _small_flax_sam2()
        x = jnp.zeros((1, 128, 128, 3), jnp.float32)
        c = jnp.zeros((1, 3, 2), jnp.float32)
        l = -jnp.ones((1, 3), jnp.int32)
        dm = jnp.zeros((1, 32, 32, 1), jnp.float32)
        variables = jax.jit(lambda k: model.init(k, x, c, l, True, dm))(jax.random.PRNGKey(0))
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        variables, report = convert_state_dict(sd, variables, strict=True)
        return ref, model, variables

    def test_param_count(self, pair):
        ref, model, variables = pair
        from bsyolo_tpu.nn.model import count_params

        n_ref = sum(p.numel() for p in ref.parameters())
        n_ref += ref.sam_prompt_encoder.pe_layer.positional_encoding_gaussian_matrix.numel()
        assert count_params(variables["params"]) == n_ref

    def test_multimask_point_parity(self, pair):
        import torch

        ref, model, variables = pair
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)
        pts = np.asarray([[[40.0, 60.0], [90.0, 30.0]]], np.float32)
        lab = np.asarray([[1, 0]], np.int64)
        with torch.no_grad():
            m_ref, iou_ref, _tok, obj_ref = ref(
                torch.from_numpy(x.transpose(0, 3, 1, 2)),
                points=(torch.from_numpy(pts), torch.from_numpy(lab)),
                multimask_output=True,
            )
        c = np.concatenate([pts, np.zeros((1, 1, 2), np.float32)], axis=1)
        l = np.concatenate([lab.astype(np.int32), -np.ones((1, 1), np.int32)], axis=1)
        masks, iou, obj, _tok = jax.jit(lambda v, xx, cc, ll: model.apply(v, xx, cc, ll, True))(
            variables, jnp.asarray(x), jnp.asarray(c), jnp.asarray(l)
        )
        np.testing.assert_allclose(np.asarray(obj), obj_ref.numpy(), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(iou), iou_ref.numpy(), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(masks), m_ref.numpy(), rtol=2e-2, atol=2e-3)

    def test_single_mask_stability_path(self, pair):
        import torch

        ref, model, variables = pair
        rng = np.random.default_rng(2)
        x = rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)
        box = np.asarray([[20.0, 30.0, 100.0, 110.0]], np.float32)
        with torch.no_grad():
            m_ref, iou_ref, _tok, _obj = ref(
                torch.from_numpy(x.transpose(0, 3, 1, 2)), boxes=torch.from_numpy(box),
                multimask_output=False,
            )
        c = box.reshape(1, 2, 2)
        l = np.asarray([[2, 3]], np.int32)
        masks, iou, _, _tok = jax.jit(lambda v, xx, cc, ll: model.apply(v, xx, cc, ll, False))(
            variables, jnp.asarray(x), jnp.asarray(c), jnp.asarray(l)
        )
        np.testing.assert_allclose(np.asarray(iou), iou_ref.numpy(), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(masks), m_ref.numpy(), rtol=2e-2, atol=2e-3)


class TestSAM2Predictor:
    def test_box_prompt_end_to_end(self):
        from bsyolo_tpu.models.sam.sam2 import SAM2Predictor

        model = _small_flax_sam2()
        x = jnp.zeros((1, 128, 128, 3), jnp.float32)
        c = jnp.zeros((1, 8, 2), jnp.float32)
        l = -jnp.ones((1, 8), jnp.int32)
        dm = jnp.zeros((1, 32, 32, 1), jnp.float32)
        variables = jax.jit(lambda k: model.init(k, x, c, l, True, dm))(jax.random.PRNGKey(0))
        p = SAM2Predictor(model, variables, img_size=128, max_points=8)
        img = np.random.default_rng(0).integers(0, 255, (100, 128, 3), np.uint8)
        r = p.set_image(img)(bboxes=[[10, 10, 60, 60]])
        assert r.masks is not None and r.masks.data.shape == (1, 100, 128)


class TestSAM2Memory:
    """Video memory branch parity (RoPE memory attention + memory encoder)."""

    def test_memory_attention_parity(self):
        import torch

        from ref_sam_model import sam2_ns
        from bsyolo_tpu.models.sam.sam2_video import MemoryAttention
        from bsyolo_tpu.utils.torch_weights import convert_state_dict

        ns = sam2_ns()
        torch.manual_seed(0)
        ref = ns["MemoryAttention"](
            d_model=256, pos_enc_at_input=True, num_layers=1,
            layer=ns["MemoryAttentionLayer"](),
        )
        ref.eval()
        model = MemoryAttention(d_model=256, num_layers=1)
        rng = np.random.default_rng(0)
        curr = rng.normal(size=(1, 64, 256)).astype(np.float32)  # 8x8 tokens
        mem = rng.normal(size=(1, 192, 64)).astype(np.float32)  # 3 frames x 64
        cpos = rng.normal(size=(1, 64, 256)).astype(np.float32)
        mpos = rng.normal(size=(1, 192, 64)).astype(np.float32)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.asarray(curr), jnp.asarray(mem),
            jnp.asarray(cpos), jnp.asarray(mpos),
        )
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        variables, _ = convert_state_dict(sd, variables, strict=True)
        with torch.no_grad():
            # reference takes seq-first (T, B, C) and flips internally
            y_ref = ref(
                torch.from_numpy(curr.transpose(1, 0, 2)),
                torch.from_numpy(mem.transpose(1, 0, 2)),
                curr_pos=torch.from_numpy(cpos.transpose(1, 0, 2)),
                memory_pos=torch.from_numpy(mpos.transpose(1, 0, 2)),
            ).numpy().transpose(1, 0, 2)
        y = model.apply(variables, jnp.asarray(curr), jnp.asarray(mem),
                        jnp.asarray(cpos), jnp.asarray(mpos))
        np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-3, atol=2e-4)

    def test_memory_encoder_parity(self):
        import torch

        from ref_sam_model import sam2_ns
        from bsyolo_tpu.models.sam.sam2_video import MemoryEncoder
        from bsyolo_tpu.utils.torch_weights import convert_state_dict

        ns = sam2_ns()
        torch.manual_seed(0)
        ref = ns["MemoryEncoder"](out_dim=64, in_dim=256)
        ref.eval()
        model = MemoryEncoder(out_dim=64, in_dim=256)
        rng = np.random.default_rng(1)
        pix = rng.normal(size=(1, 8, 8, 256)).astype(np.float32)
        mask = rng.normal(size=(1, 128, 128, 1)).astype(np.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(pix), jnp.asarray(mask))
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        variables, _ = convert_state_dict(sd, variables, strict=True)
        with torch.no_grad():
            out = ref(torch.from_numpy(pix.transpose(0, 3, 1, 2)),
                      torch.from_numpy(mask.transpose(0, 3, 1, 2)))
            mem_ref = out["vision_features"] if isinstance(out, dict) else out[0]
        mem, pos = model.apply(variables, jnp.asarray(pix), jnp.asarray(mask))
        np.testing.assert_allclose(
            np.asarray(mem).transpose(0, 3, 1, 2), mem_ref.numpy(), rtol=2e-3, atol=2e-4
        )

    def test_video_predictor_tracks(self):
        """Streaming flow: prompt frame 0, propagate 3 frames (shapes + ring)."""
        from bsyolo_tpu.models.sam.sam2_video import SAM2VideoModel, SAM2VideoPredictor

        model = SAM2VideoModel(
            img_size=128, encoder_embed_dim=16, encoder_stages=(1, 1, 2, 1),
            encoder_num_heads=1, encoder_global_att_blocks=(3,),
            encoder_window_spec=(4, 4, 4, 4), encoder_window_spatial_size=(4, 4),
            encoder_backbone_channel_list=(128, 64, 32, 16), prompt_embed_dim=256,
            decoder_mlp_dim=64, decoder_num_heads=2, iou_head_hidden_dim=32,
            num_maskmem=3,
        )
        x = jnp.zeros((1, 128, 128, 3), jnp.float32)
        c = jnp.zeros((1, 8, 2), jnp.float32)
        l = -jnp.ones((1, 8), jnp.int32)
        variables = jax.jit(lambda k: model.init(k, x, c, l, False))(jax.random.PRNGKey(0))
        p = SAM2VideoPredictor(model, variables, img_size=128, max_points=8)
        rng = np.random.default_rng(0)
        f0 = rng.integers(0, 255, (100, 128, 3), np.uint8)
        m0, iou0 = p.add_first_frame(f0, bboxes=[20, 20, 80, 80])
        assert m0.shape == (100, 128) and float(p.valid.sum()) == 1.0
        for i in range(3):
            m, iou, obj = p.track(rng.integers(0, 255, (100, 128, 3), np.uint8))
            assert m.shape == (100, 128)
        assert float(p.valid.sum()) == 3.0  # ring filled (num_maskmem=3)
