"""torch -> JAX weight conversion.

Converts a PyTorch state_dict from the reference model family (ultralytics
YOLO11 / BS-YOLO ``.pt`` checkpoints, reference nn/tasks.py:914
attempt_load_one_weight) into this framework's flax variables, by translating
parameter paths and transposing tensors into NHWC/HWIO conventions.

Path translation: flax modules are named so each path component maps 1:1 onto
a torch dotted component — ``m{i}`` -> ``model.{i}``, ``m_{j}`` -> ``m.{j}``,
``cv2_{i}_{j}`` -> ``cv2.{i}.{j}`` — with a few explicit exceptions (DWConvBN's
``dw`` wrapper level is dropped; MSCA SE convs map to ``SEn.conv.0``; ELA's
channel conv maps into its ``ch_att`` Sequential).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _translate_component(comp: str) -> Tuple[str, ...]:
    """Translate one flax path component to zero or more torch components."""
    if comp in ("dw", "detect", "ln", "ct"):
        # wrapper levels not present in torch: DWConvBN's inner ConvBN, the
        # Segment/Pose/OBB heads' nested Detect (torch heads inherit Detect,
        # so cv2/cv3 live directly on the head module), LayerNorm2d's inner
        # flax LayerNorm, and ConvTranspose2dLayer's inner ConvTranspose
        return ()
    if comp == "patch_embed_proj":  # SAM ViT stem (PatchEmbed.proj)
        return ("patch_embed", "proj")
    m = re.match(r"^m(\d+)$", comp)
    if m:
        return ("model", m.group(1))
    m = re.match(r"^SE(\d)$", comp)
    if m:
        return (f"SE{m.group(1)}", "conv", "0")
    if comp == "ch_conv":
        return ("ch_att", "2")
    m = re.match(r"^(one2one_cv[23])((?:_\d+)+)$", comp)
    if m:  # v10Detect one2one branch: digit-embedded prefix, split the rest
        return (m.group(1), *m.group(2).strip("_").split("_"))
    m = re.match(r"^decoder_layers((?:_\d+)+)$", comp)
    if m:  # RTDETRDecoder's cloned layers nest as decoder.layers.<i> in torch
        return ("decoder", "layers", *m.group(1).strip("_").split("_"))
    m = re.match(r"^layers_(\d+)_blocks_(\d+)$", comp)
    if m:  # TinyViT stage blocks: layers.<i>.blocks.<j>
        return ("layers", m.group(1), "blocks", m.group(2))
    m = re.match(r"^layers_(\d+)_downsample$", comp)
    if m:  # TinyViT patch merging: layers.<i>.downsample
        return ("layers", m.group(1), "downsample")
    if comp in ("trunk", "neck"):  # SAM2: flax top-level trunk/neck live
        return ("image_encoder", comp)  # under image_encoder in torch
    m = re.match(r"^convs_(\d+)_conv$", comp)
    if m:  # SAM2 FpnNeck laterals: neck.convs.<i>.conv
        return ("convs", m.group(1), "conv")
    m = re.match(r"^fuser_layers_(\d+)$", comp)
    if m:  # SAM2 MemoryEncoder fuser: fuser.layers.<i>
        return ("fuser", "layers", m.group(1))
    if comp in ("proj_1", "proj_2"):
        # MogaNet MultiOrderGatedAggregation attributes with literal
        # underscores in the torch name (Addmodules/Moganet.py:113-124)
        return (comp,)
    # generic: split trailing _<int> groups off snake-case prefixes (m_0 ->
    # m.0, cv2_1_2 -> cv2.1.2, input_proj_0_1 -> input_proj.0.1) but keep
    # digit-embedded names like conv0_1 (MSCA strip convs) intact
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9_]*?)((?:_\d+)+)$", comp)
    if m and not re.match(r"^conv\d$", m.group(1)):
        return (m.group(1), *m.group(2).strip("_").split("_"))
    return (comp,)


_LEAF_MAP = {
    # flax leaf -> torch leaf per collection
    ("params", "kernel"): "weight",
    ("params", "scale"): "weight",
    ("params", "bias"): "bias",
    ("batch_stats", "mean"): "running_mean",
    ("batch_stats", "var"): "running_var",
}


def flax_path_to_torch_key(collection: str, path: Tuple[str, ...]) -> str:
    *parents, leaf = path
    comps = []
    for c in parents:
        comps.extend(_translate_component(c))
    tleaf = _LEAF_MAP.get((collection, leaf), leaf)
    if leaf in ("ch_weight", "sp_weight", "res_weight"):
        return ".".join(comps + [leaf])
    # raw flax params that are nn.Embedding modules in torch (leaf.weight)
    if leaf in ("denoising_class_embed", "tgt_embed", "iou_token", "mask_tokens",
                "not_a_point_embed", "no_mask_embed", "obj_score_token"):
        return ".".join(comps + [leaf, "weight"])
    m = re.match(r"^point_embeddings_(\d+)$", leaf)  # SAM PromptEncoder ModuleList
    if m:
        return ".".join(comps + ["point_embeddings", m.group(1), "weight"])
    if leaf == "pe_layer_positional_encoding_gaussian_matrix":  # buffer on pe_layer
        return ".".join(comps + ["pe_layer", "positional_encoding_gaussian_matrix"])
    return ".".join(comps + [tleaf])


def _to_flax_tensor(torch_arr: np.ndarray, target_shape: Tuple[int, ...], path) -> np.ndarray:
    """Transpose a torch tensor into the flax layout expected at ``path``."""
    a = np.asarray(torch_arr)
    leaf = path[-1]
    if leaf == "kernel":
        if a.ndim == 4:
            # torch Conv2d weight: (out, in/groups, kH, kW)
            # flax Conv kernel: (kH, kW, in/groups, out)
            # ConvTranspose2d (in, out, kH, kW) uses the SAME perm: all flax
            # ConvTranspose modules here set transpose_kernel=True, whose
            # kernel layout is (kH, kW, out, in)
            cand = a.transpose(2, 3, 1, 0)
        elif a.ndim == 3:
            # torch Conv1d (out, in/groups, k) -> flax (k, in/groups, out)
            cand = a.transpose(2, 1, 0)
        elif a.ndim == 2:
            cand = a.T  # Dense
        else:
            cand = a
        if cand.shape != tuple(target_shape):
            raise ValueError(f"{path}: converted shape {cand.shape} != expected {tuple(target_shape)}")
        return cand
    if tuple(a.shape) != tuple(target_shape):
        # NCHW-stored positional tables (SAM2 Hiera pos_embed/pos_embed_window)
        if a.ndim == 4 and tuple(a.transpose(0, 2, 3, 1).shape) == tuple(target_shape):
            return a.transpose(0, 2, 3, 1)
        a = a.reshape(target_shape)
    return a


def convert_state_dict(state_dict: Dict[str, np.ndarray], variables, strict: bool = True):
    """Fill flax ``variables`` ({'params','batch_stats'}) from a torch state_dict.

    Returns (new_variables, report) where report lists unmatched keys.
    """
    import jax
    from flax.core import unfreeze
    from flax.traverse_util import flatten_dict, unflatten_dict

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    used = set()
    out = {}
    missing = []
    var_dict = unfreeze(variables) if hasattr(variables, "items") else variables
    for collection, tree in var_dict.items():
        flat = flatten_dict(tree)
        new_flat = {}
        for path, val in flat.items():
            key = flax_path_to_torch_key(collection, tuple(path))
            if key in sd:
                new_flat[path] = _to_flax_tensor(sd[key], val.shape, path).astype(np.asarray(val).dtype)
                used.add(key)
            else:
                missing.append(f"{collection}:{'/'.join(path)} -> {key}")
                new_flat[path] = val
        out[collection] = unflatten_dict(new_flat)
    unused = [
        k
        for k in sd
        if k not in used
        and not k.endswith("num_batches_tracked")
        and "dfl" not in k  # DFL projection is a pure function here
        and "anchors" not in k
        and "strides" not in k
    ]
    report = {"missing": missing, "unused": unused}
    if strict and (missing or unused):
        raise ValueError(f"weight conversion mismatch: {report}")
    return jax.tree_util.tree_map(lambda x: x, out), report


def load_torch_checkpoint(path: str):
    """Load a reference ``.pt`` checkpoint into a numpy state_dict.

    Mirrors reference torch_safe_load (nn/tasks.py:797): checkpoints store
    {'model': nn.Module (EMA)} — we pull its state_dict. Requires torch.
    """
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # Reference checkpoints pickle the whole nn.Module (nn/tasks.py:797),
        # which weights_only rejects. Executing the pickle runs arbitrary code:
        # only do so after an explicit warning, for files the user trusts.
        from bsyolo_tpu.utils import LOGGER

        LOGGER.warning(
            f"{path}: weights_only load failed; falling back to full unpickle. "
            "Only load checkpoints from sources you trust."
        )
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    model = ckpt.get("ema") or ckpt.get("model") if isinstance(ckpt, dict) else ckpt
    if hasattr(model, "state_dict"):
        sd = model.state_dict()
    else:
        sd = model
    meta = {}
    if isinstance(ckpt, dict):
        meta = {k: ckpt.get(k) for k in ("train_args", "epoch", "date", "version") if k in ckpt}
    return {k: v.detach().float().cpu().numpy() for k, v in sd.items()}, meta
