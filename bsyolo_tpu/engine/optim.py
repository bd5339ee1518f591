"""Optimizer + schedules replicating the reference training recipe.

Reference: ultralytics/engine/trainer.py:758-818 (build_optimizer: 3 param
groups — decayed weights / norm weights / biases — SGD nesterov or AdamW
'auto' rule) and trainer.py:209,355-375 (linear or cosine LR lambda, 3-epoch
linear warmup with a separate bias-group ramp, momentum warmup).

Implemented as pure pytree math (no optax dependency for the SGD path) so the
per-group learning rates can be plain dynamic scalars inside the jitted step:

    buf   = mu * buf + g (+ wd * p for the decayed group)   # torch SGD form
    step  = g + mu * buf                                    # nesterov
    p    -= lr_group * step
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class OptimConfig(NamedTuple):
    name: str = "auto"  # SGD | AdamW | auto
    lr0: float = 0.01
    lrf: float = 0.01
    momentum: float = 0.937
    weight_decay: float = 0.0005
    warmup_epochs: float = 3.0
    warmup_momentum: float = 0.8
    warmup_bias_lr: float = 0.1
    cos_lr: bool = False
    epochs: int = 100
    nbs: int = 64  # nominal batch size for decay scaling / accumulation


def resolve_auto(cfg: OptimConfig, nc: int, batch: int, nb_per_epoch: int) -> OptimConfig:
    """The reference 'auto' optimizer rule (trainer.py:779-788)."""
    if cfg.name != "auto":
        return cfg
    iterations = cfg.epochs * nb_per_epoch
    if iterations > 10000:
        return cfg._replace(name="SGD", lr0=0.01, momentum=0.9)
    lr_fit = round(0.002 * 5 / (4 + nc), 6)
    return cfg._replace(name="AdamW", lr0=lr_fit, momentum=0.9, warmup_bias_lr=0.0)


def param_groups(params) -> Any:
    """Label every leaf 0 (decayed weight), 1 (norm weight), or 2 (bias).

    Mirrors build_optimizer's grouping (trainer.py:789-797): anything whose
    name contains 'bias' -> group 2; norm-layer scale -> group 1; rest
    (conv/dense kernels, ELA fusion scalars) -> group 0 with weight decay.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label(path) -> int:
        leaf = str(path[-1].key) if hasattr(path[-1], "key") else str(path[-1])
        if "bias" in leaf:
            return 2
        if leaf == "scale":  # flax BatchNorm/GroupNorm scale == torch norm .weight
            return 1
        return 0

    labels = [label(p) for p, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, labels)


def scaled_weight_decay(cfg: OptimConfig, batch_size: int, accumulate: int) -> float:
    """weight_decay * batch * accumulate / nbs (reference trainer.py:301)."""
    return cfg.weight_decay * batch_size * accumulate / cfg.nbs


def lr_lambda(cfg: OptimConfig):
    """Epoch -> LR multiplier (reference trainer.py:205-213 _setup_scheduler)."""
    if cfg.cos_lr:

        def lf(e):
            return ((1 - jnp.cos(e * math.pi / cfg.epochs)) / 2) * (cfg.lrf - 1) + 1

    else:

        def lf(e):
            return jnp.maximum(1 - e / cfg.epochs, 0) * (1.0 - cfg.lrf) + cfg.lrf

    return lf


def warmup_scalars(cfg: OptimConfig, ni, nw, epoch_f, lf):
    """Per-iteration (lr_main, lr_bias, momentum) with linear warmup.

    Reference trainer.py:355-367: np.interp over [0, nw]; bias group ramps
    from warmup_bias_lr, others from 0; momentum from warmup_momentum.
    """
    base = cfg.lr0 * lf(epoch_f)
    t = jnp.clip(ni / jnp.maximum(nw, 1), 0.0, 1.0)
    in_warmup = ni <= nw
    lr_main = jnp.where(in_warmup, t * base, base)
    lr_bias = jnp.where(in_warmup, cfg.warmup_bias_lr + t * (base - cfg.warmup_bias_lr), base)
    mom = jnp.where(
        in_warmup, cfg.warmup_momentum + t * (cfg.momentum - cfg.warmup_momentum), cfg.momentum
    )
    return lr_main, lr_bias, mom


def warmup_accumulate(ni, nw, nbs_over_batch):
    """Accumulation count ramps 1 -> round(nbs/batch) during warmup (trainer.py:357)."""
    t = jnp.clip(ni / jnp.maximum(nw, 1), 0.0, 1.0)
    target = jnp.maximum(jnp.round(nbs_over_batch), 1.0)
    acc = jnp.where(ni <= nw, jnp.round(1.0 + t * (target - 1.0)), jnp.round(target))
    return jnp.maximum(acc, 1.0).astype(jnp.int32)


def sgd_update(params, grads, momentum_buf, groups, lr_main, lr_bias, mu, weight_decay):
    """One nesterov-SGD step with reference param-group semantics."""

    def upd(p, g, buf, grp):
        g = g + jnp.where(grp == 0, weight_decay, 0.0) * p  # coupled L2 like torch SGD
        new_buf = mu * buf + g
        step = g + mu * new_buf  # nesterov
        lr = jnp.where(grp == 2, lr_bias, lr_main)
        return p - lr * step, new_buf

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_b = treedef.flatten_up_to(momentum_buf)
    flat_grp = treedef.flatten_up_to(groups)
    out = [upd(p, g, b, grp) for p, g, b, grp in zip(flat_p, flat_g, flat_b, flat_grp)]
    new_params = jax.tree_util.tree_unflatten(treedef, [o[0] for o in out])
    new_buf = jax.tree_util.tree_unflatten(treedef, [o[1] for o in out])
    return new_params, new_buf


def adamw_update(params, grads, m, v, step, groups, lr_main, lr_bias, beta1, weight_decay, beta2=0.999, eps=1e-8):
    """AdamW (decoupled decay on group 0 only), per-group lr."""

    def upd(p, g, m_, v_, grp):
        new_m = beta1 * m_ + (1 - beta1) * g
        new_v = beta2 * v_ + (1 - beta2) * g * g
        mhat = new_m / (1 - beta1**step)
        vhat = new_v / (1 - beta2**step)
        lr = jnp.where(grp == 2, lr_bias, lr_main)
        decay = jnp.where(grp == 0, weight_decay, 0.0)
        return p - lr * (mhat / (jnp.sqrt(vhat) + eps) + decay * p), new_m, new_v

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(m)
    flat_v = treedef.flatten_up_to(v)
    flat_grp = treedef.flatten_up_to(groups)
    out = [upd(*t) for t in zip(flat_p, flat_g, flat_m, flat_v, flat_grp)]
    unf = lambda k: jax.tree_util.tree_unflatten(treedef, [o[k] for o in out])
    return unf(0), unf(1), unf(2)


def clip_by_global_norm(grads, max_norm: float = 10.0):
    """Reference clips grad global-norm at 10.0 (trainer.py:585-590)."""
    leaves = jax.tree_util.tree_leaves(grads)
    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale, grads), gnorm


def ema_update(ema_params, params, updates, decay: float = 0.9999, tau: float = 2000.0):
    """ModelEMA semantics (reference utils/torch_utils.py:502-539)."""
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))
    return jax.tree_util.tree_map(lambda e, p: d * e + (1.0 - d) * p, ema_params, params)
