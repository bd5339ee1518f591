"""Pallas kernel correctness vs the XLA composition (interpret mode on CPU)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax.numpy as jnp


class TestFusedDecode:
    @pytest.mark.parametrize("nc,sizes", [(12, ((8, 8), (4, 4))), (80, ((16, 16), (8, 8), (4, 4)))])
    def test_matches_xla_decode(self, rng, nc, sizes):
        from bsyolo_tpu.kernels.decode import decode_detections_pallas
        from bsyolo_tpu.nn.heads import decode_detections

        strides = tuple(64 // s[0] for s in sizes)
        b = 2
        no = 64 + nc
        feats = [jnp.asarray(rng.normal(0, 2, (b, h, w, no)).astype(np.float32)) for h, w in sizes]
        ref = np.asarray(decode_detections(feats, strides, nc))
        got = np.asarray(decode_detections_pallas(feats, strides, nc, interpret=True))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)

    def test_padding_path(self, rng):
        """Anchor counts not divisible by the tile size still decode exactly."""
        from bsyolo_tpu.kernels.decode import fused_decode_pallas
        from bsyolo_tpu.nn.modules import dfl_decode
        from bsyolo_tpu.ops.anchors import dist2bbox

        A, nc = 700, 3  # 700 % 512 != 0
        flat = jnp.asarray(rng.normal(0, 1, (1, A, 64 + nc)).astype(np.float32))
        anchors = jnp.asarray(rng.uniform(0, 20, (A, 2)).astype(np.float32))
        strides = jnp.full((A, 1), 8.0)
        got = np.asarray(fused_decode_pallas(flat, anchors, strides, nc=nc, interpret=True))
        dist = dfl_decode(flat[..., :64], 16)
        ref_box = np.asarray(dist2bbox(dist, anchors[None], xywh=True) * strides[None])
        np.testing.assert_allclose(got[..., :4], ref_box, rtol=1e-5, atol=1e-4)


class TestDetectPostprocess:
    """Fused postprocess path == decode_detections + non_max_suppression."""

    def _feats(self, rng, nc=12, b=2, img=64):
        sizes = [(img // s, img // s) for s in (8, 16, 32)]
        strides = (8, 16, 32)
        no = 64 + nc
        feats = [
            jnp.asarray(rng.normal(0, 1.5, (b, h, w, no)).astype(np.float32)) for h, w in sizes
        ]
        return feats, strides, nc

    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_matches_reference_composition(self, rng, use_pallas):
        from bsyolo_tpu.kernels.postprocess import detect_postprocess
        from bsyolo_tpu.nn.heads import decode_detections
        from bsyolo_tpu.ops.nms import non_max_suppression

        feats, strides, nc = self._feats(rng)
        preds = decode_detections(feats, strides, nc)
        ref, ref_idx = non_max_suppression(
            preds, conf_thres=0.25, iou_thres=0.7, max_det=50, pre_k=256, nc=nc, return_idx=True
        )
        got, got_idx = detect_postprocess(
            feats, strides, nc, conf_thres=0.25, iou_thres=0.7, max_det=50, pre_k=256,
            use_pallas=use_pallas, interpret=use_pallas, return_idx=True,
        )
        ref, got = np.asarray(ref), np.asarray(got)
        # same kept anchors, same classes, same scores; boxes in xyxy
        np.testing.assert_array_equal(np.asarray(ref_idx), np.asarray(got_idx))
        np.testing.assert_array_equal(ref[..., 5], got[..., 5])
        np.testing.assert_allclose(ref[..., 4], got[..., 4], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(ref[..., :4], got[..., :4], rtol=1e-4, atol=1e-3)

    def test_single_label_path(self, rng):
        from bsyolo_tpu.kernels.postprocess import detect_postprocess
        from bsyolo_tpu.nn.heads import decode_detections
        from bsyolo_tpu.ops.nms import non_max_suppression

        feats, strides, nc = self._feats(rng, nc=5, b=1)
        preds = decode_detections(feats, strides, nc)
        ref = non_max_suppression(
            preds, conf_thres=0.1, iou_thres=0.5, max_det=20, pre_k=128, nc=nc, multi_label=False
        )
        got = detect_postprocess(
            feats, strides, nc, conf_thres=0.1, iou_thres=0.5, max_det=20, pre_k=128,
            multi_label=False, use_pallas=False,
        )
        np.testing.assert_allclose(np.asarray(ref)[..., 4:], np.asarray(got)[..., 4:], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ref)[..., :4], np.asarray(got)[..., :4], rtol=1e-4, atol=1e-3)


class TestInt8Matmul:
    def test_exact_vs_int32_reference(self, rng):
        """kernels/int8_matmul.py: the Pallas int8 MXU kernel must equal the
        int32 matmul + per-channel dequant exactly (integer accumulation has
        no rounding; round-5 int8 probe, VERDICT r4 #3)."""
        import jax.numpy as jnp

        from bsyolo_tpu.kernels.int8_matmul import int8_matmul, quantize_sym

        M, K, N = 512, 128, 128
        x = rng.normal(0, 1, (M, K)).astype(np.float32)
        w = rng.normal(0, 0.05, (K, N)).astype(np.float32)
        xq, sx = quantize_sym(jnp.asarray(x))
        wq, sw = quantize_sym(jnp.asarray(w), axis=0)
        got = np.asarray(
            int8_matmul(xq, wq, sw.reshape(-1), sx.reshape(()),
                        out_dtype=jnp.float32, interpret=True)
        )
        want = (np.asarray(xq, np.int32) @ np.asarray(wq, np.int32)).astype(np.float32)
        want = want * (float(sx) * np.asarray(sw).reshape(-1))[None, :]
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_quantize_sym_roundtrip(self, rng):
        from bsyolo_tpu.kernels.int8_matmul import quantize_sym

        w = rng.normal(0, 0.1, (64, 32)).astype(np.float32)
        q, s = quantize_sym(jnp.asarray(w), axis=0)
        back = np.asarray(q, np.float32) * np.asarray(s)
        assert np.abs(back - w).max() < np.abs(w).max() / 100  # 8-bit grid
        assert np.asarray(q).dtype == np.int8
