"""SAM model builders (reference models/sam/build.py).

Each builder returns ``(model, variables)`` with jitted initialization.
Checkpoint loading goes through utils/torch_weights.convert_state_dict —
the flax parameter tree is named to line up with the official SAM
state_dict keys (sam_vit_b/l/h.pt, mobile_sam.pt).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bsyolo_tpu.models.sam.modules import SAMModel

# encoder configs: embed_dim, depth, num_heads, global_attn_indexes
# (reference build.py:23-54)
_VIT_CFGS = {
    "b": (768, 12, 12, (2, 5, 8, 11)),
    "l": (1024, 24, 16, (5, 11, 17, 23)),
    "h": (1280, 32, 16, (7, 15, 23, 31)),
}


def build_sam_vit(
    variant: str = "b",
    img_size: int = 1024,
    checkpoint: Optional[str] = None,
    dtype=jnp.float32,
    max_points: int = 8,
):
    """Build SAM ViT-B/L/H: ``build_sam_vit("b")`` (reference build_sam_vit_b)."""
    embed_dim, depth, num_heads, gidx = _VIT_CFGS[variant]
    model = SAMModel(
        img_size=img_size,
        encoder_embed_dim=embed_dim,
        encoder_depth=depth,
        encoder_num_heads=num_heads,
        encoder_global_attn_indexes=gidx,
        dtype=dtype,
    )
    x = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    coords = jnp.zeros((1, max_points, 2), jnp.float32)
    labels = -jnp.ones((1, max_points), jnp.int32)
    g4 = img_size // 4  # mask prompts enter at 4x the embedding grid
    dummy_mask = jnp.zeros((1, g4, g4, 1), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, x, coords, labels, True, dummy_mask))(
        jax.random.PRNGKey(0)
    )
    if checkpoint is not None:
        from bsyolo_tpu.utils.torch_weights import convert_state_dict, load_torch_checkpoint

        sd, _ = load_torch_checkpoint(checkpoint)
        variables, _ = convert_state_dict(sd, variables, strict=False)
    return model, variables


def build_mobile_sam(img_size: int = 1024, checkpoint: Optional[str] = None, dtype=jnp.float32,
                     max_points: int = 8):
    """MobileSAM: TinyViT image encoder + the standard SAM prompt/mask heads
    (reference build.py:56 build_mobile_sam)."""
    from bsyolo_tpu.models.sam.tiny_encoder import TinySAMModel

    model = TinySAMModel(img_size=img_size, dtype=dtype)
    x = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    coords = jnp.zeros((1, max_points, 2), jnp.float32)
    labels = -jnp.ones((1, max_points), jnp.int32)
    g4 = img_size // 4  # mask prompts enter at 4x the embedding grid
    dummy_mask = jnp.zeros((1, g4, g4, 1), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, x, coords, labels, True, dummy_mask))(
        jax.random.PRNGKey(0)
    )
    if checkpoint is not None:
        from bsyolo_tpu.utils.torch_weights import convert_state_dict, load_torch_checkpoint

        sd, _ = load_torch_checkpoint(checkpoint)
        variables, _ = convert_state_dict(sd, variables, strict=False)
    return model, variables


_BUILDERS = {
    "sam_b.pt": lambda **kw: build_sam_vit("b", **kw),
    "sam_l.pt": lambda **kw: build_sam_vit("l", **kw),
    "sam_h.pt": lambda **kw: build_sam_vit("h", **kw),
    "mobile_sam.pt": lambda **kw: build_mobile_sam(**kw),
}


def build_sam(ckpt: str = "sam_b.pt", **kw):
    """Name-dispatch builder (reference build.py:358 build_sam)."""
    from pathlib import Path

    name = Path(ckpt).name
    for key, fn in _BUILDERS.items():
        if name.startswith(key.split(".")[0]):
            if Path(ckpt).exists():
                kw.setdefault("checkpoint", ckpt)
            return fn(**kw)
    raise FileNotFoundError(f"{ckpt} is not a supported SAM model; available: {list(_BUILDERS)}")
