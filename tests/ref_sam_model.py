"""Torch-side golden SAM modules, AST-extracted from /root/reference.

Same oracle approach as ref_torch_model.py: pull the real reference class
bodies (ImageEncoderViT, PromptEncoder, MaskDecoder, TwoWayTransformer,
TinyViT, ...) into a fresh namespace so they run without importing the
(un-importable) reference package.
"""

from __future__ import annotations

import ast
import functools
import itertools
import math
from pathlib import Path

import torch
import torch.nn as nn

REF = Path("/root/reference/ultralytics")


class _StripRelativeImports(ast.NodeTransformer):
    def visit_ImportFrom(self, node):
        if node.level and node.level > 0:
            return ast.copy_location(ast.Pass(), node)
        return node


def _pull(ns, relpath, names):
    src = (REF / relpath).read_text()
    tree = ast.parse(src)
    tree = ast.fix_missing_locations(_StripRelativeImports().visit(tree))
    pending = [
        n for n in tree.body if isinstance(n, (ast.FunctionDef, ast.ClassDef)) and n.name in names
    ]
    missing = set(names) - {n.name for n in pending}
    if missing:
        raise KeyError(f"{relpath}: {missing}")
    while pending:
        progress = False
        errors = []
        for node in list(pending):
            try:
                mod = ast.Module(body=[node], type_ignores=[])
                exec(compile(mod, f"{relpath}:{node.name}", "exec"), ns)
                pending.remove(node)
                progress = True
            except NameError as e:
                errors.append((node.name, e))
        if not progress:
            raise NameError(f"{relpath}: unresolved {errors}")


@functools.lru_cache(maxsize=None)
def sam_ns():
    import copy

    import numpy as np
    import torch.nn.functional as F
    import torch.utils.checkpoint as checkpoint
    from functools import partial
    from typing import Any, Callable, List, Optional, Sequence, Tuple, Type, Union

    from torch import Tensor
    from torch.nn.init import constant_, uniform_, xavier_uniform_

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    ns = {
        "torch": torch, "nn": nn, "F": F, "np": np, "math": math, "copy": copy,
        "itertools": itertools, "checkpoint": checkpoint, "partial": partial,
        "Tensor": Tensor, "Any": Any, "Callable": Callable, "List": List,
        "Optional": Optional, "Sequence": Sequence, "Tuple": Tuple, "Type": Type,
        "Union": Union, "to_2tuple": to_2tuple, "constant_": constant_,
        "uniform_": uniform_, "xavier_uniform_": xavier_uniform_,
        "__name__": "ref_sam_model",
    }
    _pull(ns, "nn/modules/transformer.py", ["MLPBlock", "MLP", "LayerNorm2d"])
    _pull(
        ns, "models/sam/modules/utils.py",
        ["window_partition", "window_unpartition", "get_rel_pos", "add_decomposed_rel_pos"],
    )
    _pull(
        ns, "models/sam/modules/transformer.py",
        ["Attention", "TwoWayAttentionBlock", "TwoWayTransformer"],
    )
    _pull(
        ns, "models/sam/modules/blocks.py",
        ["PatchEmbed", "PositionEmbeddingRandom", "Block", "REAttention"],
    )
    _pull(ns, "models/sam/modules/encoders.py", ["ImageEncoderViT", "PromptEncoder"])
    _pull(ns, "models/sam/modules/decoders.py", ["MaskDecoder"])
    _pull(
        ns, "models/sam/modules/tiny_encoder.py",
        ["Conv2d_BN", "PatchEmbed", "MBConv", "PatchMerging", "ConvLayer", "Mlp",
         "Attention", "TinyViTBlock", "BasicLayer", "TinyViT"],
    )
    # NOTE: tiny_encoder defines its own PatchEmbed/Attention, overwriting the
    # SAM-ViT ones pulled above — grab the ViT versions before this last pull
    # via vit_ns() if both are needed simultaneously.
    return ns


@functools.lru_cache(maxsize=None)
def vit_ns():
    """Namespace with the SAM-ViT (non-Tiny) PatchEmbed/Attention versions."""
    import copy

    import numpy as np
    import torch.nn.functional as F
    from functools import partial
    from typing import Any, Callable, List, Optional, Sequence, Tuple, Type, Union

    from torch import Tensor

    ns = {
        "torch": torch, "nn": nn, "F": F, "np": np, "math": math, "copy": copy,
        "partial": partial, "Tensor": Tensor, "Any": Any, "Callable": Callable,
        "List": List, "Optional": Optional, "Sequence": Sequence, "Tuple": Tuple,
        "Type": Type, "Union": Union, "__name__": "ref_sam_model.vit",
    }
    ns["itertools"] = itertools
    _pull(ns, "nn/modules/transformer.py", ["MLPBlock", "MLP", "LayerNorm2d"])
    _pull(
        ns, "models/sam/modules/utils.py",
        ["window_partition", "window_unpartition", "get_rel_pos", "add_decomposed_rel_pos"],
    )
    _pull(
        ns, "models/sam/modules/transformer.py",
        ["Attention", "TwoWayAttentionBlock", "TwoWayTransformer"],
    )
    _pull(
        ns, "models/sam/modules/blocks.py",
        ["PatchEmbed", "PositionEmbeddingRandom", "Block", "REAttention"],
    )
    _pull(ns, "models/sam/modules/encoders.py", ["ImageEncoderViT", "PromptEncoder"])
    _pull(ns, "models/sam/modules/decoders.py", ["MaskDecoder"])
    return ns


def build_ref_sam(img_size=128, embed_dim=64, depth=2, num_heads=2,
                  global_attn_indexes=(1,), prompt_dim=32, window_size=4):
    """Small torch SAM (encoder+prompt+decoder) for parity tests."""
    ns = vit_ns()
    torch.manual_seed(0)
    enc = ns["ImageEncoderViT"](
        img_size=img_size, patch_size=16, embed_dim=embed_dim, depth=depth,
        num_heads=num_heads, mlp_ratio=4, out_chans=prompt_dim, qkv_bias=True,
        norm_layer=__import__("functools").partial(torch.nn.LayerNorm, eps=1e-6),
        use_rel_pos=True, global_attn_indexes=global_attn_indexes,
        window_size=window_size,
    )
    grid = img_size // 16
    pe = ns["PromptEncoder"](
        embed_dim=prompt_dim, image_embedding_size=(grid, grid),
        input_image_size=(img_size, img_size), mask_in_chans=16,
    )
    dec = ns["MaskDecoder"](
        num_multimask_outputs=3,
        transformer=ns["TwoWayTransformer"](depth=2, embedding_dim=prompt_dim, mlp_dim=64, num_heads=2),
        transformer_dim=prompt_dim, iou_head_depth=3, iou_head_hidden_dim=32,
    )

    class RefSAM(nn.Module):
        def __init__(self):
            super().__init__()
            self.image_encoder = enc
            self.prompt_encoder = pe
            self.mask_decoder = dec

        @torch.no_grad()
        def forward(self, x, points=None, boxes=None, multimask_output=True):
            emb = self.image_encoder(x)
            sparse, dense = self.prompt_encoder(points=points, boxes=boxes, masks=None)
            masks, iou = self.mask_decoder(
                image_embeddings=emb,
                image_pe=self.prompt_encoder.get_dense_pe(),
                sparse_prompt_embeddings=sparse,
                dense_prompt_embeddings=dense,
                multimask_output=multimask_output,
            )
            return masks, iou

    m = RefSAM()
    m.eval()
    return m


def build_ref_tinyvit(img_size=128, embed_dims=(8, 12, 16, 20), depths=(1, 1, 2, 1),
                      num_heads=(1, 2, 2, 2), window_sizes=(4, 4, 7, 4)):
    """Small torch TinyViT for parity tests (MobileSAM encoder shape)."""
    ns = sam_ns()
    torch.manual_seed(0)
    m = ns["TinyViT"](
        img_size=img_size, in_chans=3, num_classes=1000,
        embed_dims=list(embed_dims), depths=list(depths), num_heads=list(num_heads),
        window_sizes=list(window_sizes), mlp_ratio=4.0, drop_rate=0.0,
        drop_path_rate=0.0, use_checkpoint=False, mbconv_expand_ratio=4.0,
        local_conv_size=3, layer_lr_decay=1.0,
    )
    m.eval()
    return m


@functools.lru_cache(maxsize=None)
def sam2_ns():
    """Namespace with the SAM2 image-path reference classes."""
    import copy

    import numpy as np
    import torch.nn.functional as F
    from functools import partial
    from typing import Any, Callable, List, Optional, Sequence, Tuple, Type, Union

    from torch import Tensor

    ns = {
        "torch": torch, "nn": nn, "F": F, "np": np, "math": math, "copy": copy,
        "partial": partial, "Tensor": Tensor, "Any": Any, "Callable": Callable,
        "List": List, "Optional": Optional, "Sequence": Sequence, "Tuple": Tuple,
        "Type": Type, "Union": Union, "itertools": itertools,
        "__name__": "ref_sam_model.sam2",
    }
    _pull(ns, "nn/modules/transformer.py", ["MLPBlock", "MLP", "LayerNorm2d"])
    _pull(
        ns, "models/sam/modules/utils.py",
        ["window_partition", "window_unpartition", "get_rel_pos", "add_decomposed_rel_pos"],
    )
    _pull(
        ns, "models/sam/modules/transformer.py",
        ["Attention", "TwoWayAttentionBlock", "TwoWayTransformer"],
    )
    _pull(
        ns, "models/sam/modules/blocks.py",
        ["DropPath", "PatchEmbed", "PositionEmbeddingRandom", "PositionEmbeddingSine",
         "do_pool", "MultiScaleAttention", "MultiScaleBlock"],
    )
    _pull(
        ns, "models/sam/modules/utils.py",
        ["init_t_xy", "compute_axial_cis", "reshape_for_broadcast", "apply_rotary_enc"],
    )
    _pull(ns, "models/sam/modules/blocks.py",
          ["RoPEAttention", "MaskDownSampler", "CXBlock", "Fuser"])
    _pull(ns, "models/sam/modules/encoders.py",
          ["PromptEncoder", "Hiera", "FpnNeck", "ImageEncoder", "MemoryEncoder"])
    _pull(ns, "models/sam/modules/decoders.py", ["MaskDecoder", "SAM2MaskDecoder"])
    _pull(ns, "models/sam/modules/memory_attention.py",
          ["MemoryAttentionLayer", "MemoryAttention"])
    return ns


def build_ref_sam2(img_size=128, embed_dim=16, stages=(1, 1, 2, 1), num_heads=1,
                   global_att_blocks=(3,), window_spec=(4, 4, 4, 4),
                   window_spatial_size=(4, 4), prompt_dim=32):
    """Small torch SAM2 image path for parity tests."""
    ns = sam2_ns()
    torch.manual_seed(0)
    dims = [embed_dim * (2**i) for i in range(4)]  # 16,32,64,128
    bcl = dims[::-1]
    trunk = ns["Hiera"](
        embed_dim=embed_dim, num_heads=num_heads, stages=list(stages),
        global_att_blocks=list(global_att_blocks), window_spec=list(window_spec),
        window_pos_embed_bkg_spatial_size=list(window_spatial_size),
    )
    neck = ns["FpnNeck"](
        d_model=prompt_dim, backbone_channel_list=list(bcl),
        fpn_top_down_levels=[2, 3], fpn_interp_model="nearest",
    )
    pe = ns["PromptEncoder"](
        embed_dim=prompt_dim, image_embedding_size=(img_size // 16, img_size // 16),
        input_image_size=(img_size, img_size), mask_in_chans=16,
    )
    dec = ns["SAM2MaskDecoder"](
        transformer_dim=prompt_dim,
        transformer=ns["TwoWayTransformer"](depth=2, embedding_dim=prompt_dim, mlp_dim=64, num_heads=2),
        num_multimask_outputs=3, iou_head_depth=3, iou_head_hidden_dim=32,
        use_high_res_features=True, iou_prediction_use_sigmoid=True,
        dynamic_multimask_via_stability=True, pred_obj_scores=True, pred_obj_scores_mlp=True,
    )

    class _Enc(nn.Module):
        """trunk+neck container matching official sam2 key layout."""

        def __init__(self):
            super().__init__()
            self.trunk = trunk
            self.neck = neck

    class RefSAM2(nn.Module):
        def __init__(self):
            super().__init__()
            self.image_encoder = _Enc()
            self.sam_prompt_encoder = pe
            self.sam_mask_decoder = dec

        @property
        def trunk(self):
            return self.image_encoder.trunk

        @torch.no_grad()
        def forward(self, x, points=None, boxes=None, multimask_output=True):
            feats, _pos = self.image_encoder.neck(self.image_encoder.trunk(x))
            feats = feats[:-1]  # scalp=1
            s0 = self.sam_mask_decoder.conv_s0(feats[0])
            s1 = self.sam_mask_decoder.conv_s1(feats[1])
            emb = feats[2]
            sparse, dense = self.sam_prompt_encoder(points=points, boxes=boxes, masks=None)
            return self.sam_mask_decoder(
                image_embeddings=emb,
                image_pe=self.sam_prompt_encoder.get_dense_pe(),
                sparse_prompt_embeddings=sparse,
                dense_prompt_embeddings=dense,
                multimask_output=multimask_output,
                repeat_image=False,
                high_res_features=[s0, s1],
            )

    m = RefSAM2()
    m.eval()
    return m
