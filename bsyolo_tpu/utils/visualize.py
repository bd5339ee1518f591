"""Feature-map visualization (reference nn/tasks.py:138-166 `visualize` flag +
utils/plotting.py feature_visualization).

Uses flax's capture_intermediates to pull per-layer activations out of the
graph walk, then tiles the first channels of each requested layer.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


def capture_features(model, variables, x, layer_names: Optional[List[str]] = None) -> Dict[str, np.ndarray]:
    """Run the model capturing intermediate outputs. Returns {layer: activation}."""
    import jax

    def filter_fn(mdl, method_name):
        return method_name == "__call__"

    _, state = jax.jit(
        lambda v, t: model.apply(v, t, train=False, capture_intermediates=filter_fn, mutable=["intermediates"])
    )(variables, x)
    inter = state["intermediates"]
    out: Dict[str, np.ndarray] = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            name = f"{prefix}/{k}" if prefix else k
            if k == "__call__":
                val = v[0]
                if hasattr(val, "shape") and getattr(val, "ndim", 0) == 4:
                    out[prefix] = np.asarray(val)
            elif isinstance(v, dict):
                walk(v, name)

    walk(inter)
    if layer_names:
        out = {k: v for k, v in out.items() if any(k.startswith(n) or k == n for n in layer_names)}
    return out


def feature_visualization(
    features: np.ndarray, save_path: str, n_channels: int = 32
) -> str:
    """Tile the first channels of one (1, H, W, C) activation into a grid."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    f = features[0]
    c = min(n_channels, f.shape[-1])
    cols = 8
    rows = (c + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(cols * 1.4, rows * 1.4), squeeze=False)
    for i in range(rows * cols):
        ax = axes[i // cols][i % cols]
        ax.axis("off")
        if i < c:
            ax.imshow(f[..., i], cmap="viridis")
    fig.tight_layout(pad=0.2)
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_path, dpi=110)
    plt.close(fig)
    return save_path


def grad_cam(
    model,
    variables,
    img: np.ndarray,
    layer: int,
    class_id: Optional[int] = None,
    conf_thres: float = 0.25,
    strides=None,
    nc: Optional[int] = None,
    imgsz: int = 640,
    method: str = "gradcam",
):
    """CAM heatmap for a detection model (the TPU-native equivalent of
    reference sys/heatmap.py:22 ActivationsAndGradients + yolov8_heatmap,
    which fans out to the external pytorch_grad_cam methods).

    ``method``: "gradcam" (GAP-weighted gradients), "gradcampp" (GradCAM++
    alpha-weighted positive gradients), or "eigencam" (gradient-free first
    principal component of the activations).

    ``layer`` is the graph index (0-based, the YAML row). The score is the
    summed top-class confidence over anchors above ``conf_thres`` (optionally
    restricted to ``class_id``); its gradient is taken w.r.t. the layer's
    activation via the graph's zero-valued perturbation taps
    (nn/model.DetectionGraph ``perturb=True``), then GAP-weighted and ReLU'd.

    Returns (cam (h, w) float in [0, 1] at the feature resolution, overlay
    uint8 (H, W, 3) resized onto the input image).
    """
    import cv2
    import jax
    import jax.numpy as jnp

    from bsyolo_tpu.nn.heads import decode_detections
    from bsyolo_tpu.ops import letterbox_image

    spec = getattr(model, "spec", None)
    if strides is None and spec is not None:
        strides = spec.head_strides
    if nc is None and spec is not None:
        nc = spec.nc

    size = imgsz
    lb, r, (dw, dh) = letterbox_image(img, (size, size))
    x = jnp.asarray(lb[None].astype(np.float32) / 255.0)

    # 1. collect the zero perturbation tree (and the activations)
    _, mut = model.apply(
        variables, x, train=False, perturb=True, mutable=["perturbations"]
    )
    zeros = mut["perturbations"]
    key = f"l{layer}"
    if key not in zeros:
        raise KeyError(f"layer {layer} has no spatial activation tap; available: {list(zeros)}")

    def score_fn(pert):
        feats = model.apply(
            {**variables, "perturbations": pert}, x, train=False, perturb=True
        )
        preds = decode_detections(
            feats, strides, nc, reg_max=getattr(spec, "reg_max", 16)
        )  # (1, A, 4+nc)
        cls_scores = preds[..., 4:]
        if class_id is not None:
            sc = cls_scores[..., class_id]
        else:
            sc = jnp.max(cls_scores, axis=-1)
        return jnp.sum(jnp.where(sc > conf_thres, sc, 0.0)), feats

    acts = capture_features(model, variables, x, layer_names=[f"m{layer}"])
    act = next((v for k, v in acts.items() if k == f"m{layer}" or k.endswith(f"/m{layer}")), None)
    if act is None:  # fall back to any prefix match
        act = next(v for k, v in acts.items() if f"m{layer}" in k)
    a = act[0].astype(np.float32)

    if method == "eigencam":
        # gradient-free: project activations onto their first principal
        # component (pytorch_grad_cam EigenCAM semantics)
        flat = a.reshape(-1, a.shape[-1])
        flat = flat - flat.mean(axis=0)
        _, _, vt = np.linalg.svd(flat, full_matrices=False)
        cam = (flat @ vt[0]).reshape(a.shape[:2])
        cam = np.maximum(cam, 0.0) if cam.max() > -cam.min() else np.maximum(-cam, 0.0)
    else:
        grads, _ = jax.grad(score_fn, has_aux=True)(zeros)
        g = np.asarray(grads[key][0], np.float32)  # (h, w, c)
        if method == "gradcampp":
            # alpha-weighted positive gradients (Grad-CAM++ eq. 19 /
            # pytorch_grad_cam: denom = 2g^2 + (sum_space a) * g^3, pointwise)
            g2, g3 = g * g, g * g * g
            sum_a = a.sum(axis=(0, 1), keepdims=True)
            denom = 2.0 * g2 + sum_a * g3
            # exact-zero denom -> divide by 1 (pytorch_grad_cam's ones_like
            # substitution); 1e-8 here would inflate alpha ~1e8x at
            # cancelling pixels and let one location dominate the CAM
            alpha = g2 / np.where(denom != 0, denom, 1.0)
            alpha = np.where(g != 0, alpha, 0.0)
            w = (alpha * np.maximum(g, 0.0)).sum(axis=(0, 1))
        elif method == "gradcam":
            w = g.mean(axis=(0, 1))  # GAP over space -> per-channel weight
        else:
            raise ValueError(f"unknown CAM method '{method}'")
        cam = np.maximum((a * w).sum(-1), 0.0)
    if cam.max() > 0:
        cam = cam / cam.max()

    heat = cv2.applyColorMap((cam * 255).astype(np.uint8), cv2.COLORMAP_JET)[..., ::-1]
    heat = cv2.resize(heat, (size, size), interpolation=cv2.INTER_LINEAR)
    # crop letterbox pad, resize onto the original image
    hs, ws = int(round(img.shape[0] * r)), int(round(img.shape[1] * r))
    heat = heat[int(dh) : int(dh) + hs, int(dw) : int(dw) + ws]
    heat = cv2.resize(heat, (img.shape[1], img.shape[0]), interpolation=cv2.INTER_LINEAR)
    overlay = (0.5 * img.astype(np.float32) + 0.5 * heat.astype(np.float32)).astype(np.uint8)
    return cam, overlay
