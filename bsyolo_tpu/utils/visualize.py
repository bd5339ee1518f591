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
