"""DCNv3 golden parity vs the reference pure-torch core (dcnv3_func.py:147)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax.numpy as jnp

import ref_oracle


def _ref_core():
    ns = ref_oracle._extract(
        "ultralytics/nn/ops_dcnv3/functions/dcnv3_func.py",
        ("dcnv3_core_pytorch", "_get_reference_points", "_generate_dilation_grids"),
    )
    return ns["dcnv3_core_pytorch"]


class TestDCNv3Golden:
    @pytest.mark.parametrize("group,gc,k,stride", [(2, 8, 3, 1), (1, 16, 3, 1), (4, 4, 3, 2)])
    def test_core_matches_reference(self, rng, group, gc, k, stride):
        import torch

        from bsyolo_tpu.ops.deform import dcnv3_core

        core = _ref_core()
        N, H, W = 2, 10, 12
        C = group * gc
        pad = k // 2
        H_out = (H + 2 * pad - (k - 1) - 1) // stride + 1
        W_out = (W + 2 * pad - (k - 1) - 1) // stride + 1
        P = k * k
        x = rng.normal(0, 1, (N, H, W, C)).astype(np.float32)
        offset = (rng.normal(0, 1, (N, H_out, W_out, group * P * 2)) * 2).astype(np.float32)
        mask_logits = rng.normal(0, 1, (N, H_out, W_out, group * P)).astype(np.float32)
        # the reference core expects the mask already softmaxed per group
        m = mask_logits.reshape(N, H_out, W_out, group, P)
        m = np.exp(m) / np.exp(m).sum(-1, keepdims=True)
        m = m.reshape(N, H_out, W_out, group * P).astype(np.float32)

        ref = core(
            torch.from_numpy(x),
            torch.from_numpy(offset),
            torch.from_numpy(m),
            k, k, stride, stride, pad, pad, 1, 1, group, gc, 1.0,
        ).numpy()

        got = np.asarray(
            dcnv3_core(
                jnp.asarray(x),
                jnp.asarray(offset),
                jnp.asarray(m),
                kernel_h=k,
                kernel_w=k,
                stride_h=stride,
                stride_w=stride,
                pad_h=pad,
                pad_w=pad,
                group=group,
                group_channels=gc,
                offset_scale=1.0,
                softmax_mask=False,
            )
        )
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_module_builds_and_runs(self, rng):
        import jax

        from bsyolo_tpu.ops.deform import DCNv3

        m = DCNv3(channels=32, group=4)
        x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 32)).astype(np.float32))
        variables = jax.jit(lambda k, t: m.init(k, t, train=False))(jax.random.PRNGKey(0), x)
        y = jax.jit(lambda v, t: m.apply(v, t, train=False))(variables, x)
        assert y.shape == (1, 8, 8, 32)
        g = jax.jit(
            jax.grad(lambda v: jnp.sum(m.apply(v, x, train=False) ** 2))
        )(variables)
        assert all(np.all(np.isfinite(np.asarray(t))) for t in jax.tree_util.tree_leaves(g))
