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


# SAM2 encoder configs: embed, stages, heads, global_att_blocks,
# window_spec, window_spatial_size, backbone_channel_list
# (reference build.py:68-120)
_SAM2_CFGS = {
    "t": (96, (1, 2, 7, 2), 1, (5, 7, 9), (8, 4, 14, 7), (7, 7), (768, 384, 192, 96)),
    "s": (96, (1, 2, 11, 2), 1, (7, 10, 13), (8, 4, 14, 7), (7, 7), (768, 384, 192, 96)),
    "b": (112, (2, 3, 16, 3), 2, (12, 16, 20), (8, 4, 14, 7), (14, 14), (896, 448, 224, 112)),
    "l": (144, (2, 6, 36, 4), 2, (23, 33, 43), (8, 4, 16, 8), (7, 7), (1152, 576, 288, 144)),
}


def build_sam2(variant: str = "t", img_size: int = 1024, checkpoint: Optional[str] = None,
               dtype=jnp.float32, max_points: int = 8, video: bool = False):
    """Build SAM2 tiny/small/base/large (reference build.py:68 build_sam2_*).
    ``video=True`` builds the streaming tracker model with the memory branch
    (sam2_video.SAM2VideoModel)."""
    from bsyolo_tpu.models.sam.sam2 import SAM2Model
    from bsyolo_tpu.models.sam.sam2_video import SAM2VideoModel

    dim, stages, heads, gab, wspec, wss, bcl = _SAM2_CFGS[variant]
    cls = SAM2VideoModel if video else SAM2Model
    model = cls(
        img_size=img_size,
        encoder_embed_dim=dim,
        encoder_stages=stages,
        encoder_num_heads=heads,
        encoder_global_att_blocks=gab,
        encoder_window_spec=wspec,
        encoder_window_spatial_size=wss,
        encoder_backbone_channel_list=bcl,
        dtype=dtype,
    )
    x = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    coords = jnp.zeros((1, max_points, 2), jnp.float32)
    labels = -jnp.ones((1, max_points), jnp.int32)
    g4 = img_size // 4
    dummy_mask = jnp.zeros((1, g4, g4, 1), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, x, coords, labels, True, dummy_mask))(
        jax.random.PRNGKey(0)
    )
    if checkpoint is not None:
        from bsyolo_tpu.utils.torch_weights import convert_state_dict, load_torch_checkpoint

        sd, _ = load_torch_checkpoint(checkpoint)
        if not video:
            # image-only model: drop the memory-branch weights
            sd = {k: v for k, v in sd.items() if not k.startswith(
                ("memory_attention", "memory_encoder", "obj_ptr", "mask_downsample",
                 "no_mem", "no_obj", "maskmem")
            )}
        variables, _ = convert_state_dict(sd, variables, strict=False)
    return model, variables


_BUILDERS = {
    "sam_b.pt": lambda **kw: build_sam_vit("b", **kw),
    "sam_l.pt": lambda **kw: build_sam_vit("l", **kw),
    "sam_h.pt": lambda **kw: build_sam_vit("h", **kw),
    "mobile_sam.pt": lambda **kw: build_mobile_sam(**kw),
    "sam2_t.pt": lambda **kw: build_sam2("t", **kw),
    "sam2_s.pt": lambda **kw: build_sam2("s", **kw),
    "sam2_b.pt": lambda **kw: build_sam2("b", **kw),
    "sam2_l.pt": lambda **kw: build_sam2("l", **kw),
    "sam2.1_t.pt": lambda **kw: build_sam2("t", **kw),
    "sam2.1_s.pt": lambda **kw: build_sam2("s", **kw),
    "sam2.1_b.pt": lambda **kw: build_sam2("b", **kw),
    "sam2.1_l.pt": lambda **kw: build_sam2("l", **kw),
}


def build_sam(ckpt: str = "sam_b.pt", **kw):
    """Name-dispatch builder (reference build.py:358 build_sam)."""
    from pathlib import Path

    name = Path(ckpt).name
    key = name if name in _BUILDERS else None
    if key is None:  # prefix match, longest key first (sam2.1_t before sam2)
        for k in sorted(_BUILDERS, key=len, reverse=True):
            if name.startswith(k[: -len(".pt")]):
                key = k
                break
    if key is None:
        raise FileNotFoundError(f"{ckpt} is not a supported SAM model; available: {list(_BUILDERS)}")
    if Path(ckpt).exists():
        kw.setdefault("checkpoint", ckpt)
    return _BUILDERS[key](**kw)
