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
