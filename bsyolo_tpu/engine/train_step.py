"""The jitted training step and its carried state.

TPU-first redesign of the reference hot loop (ultralytics/engine/trainer.py
_do_train:318-430): everything the reference mutates imperatively per
iteration — optimizer momentum, grad accumulation buffers, EMA weights, BN
running stats, the EMA-Slide loss counters, warmup-interpolated lr/momentum —
is explicit state threaded through one compiled XLA program. Gradient
all-reduce happens implicitly when the batch is sharded over the mesh's
"data" axis (replaces DDP allreduce, trainer.py:273).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax.struct import dataclass as flax_dataclass

from bsyolo_tpu.engine import optim as O
from bsyolo_tpu.losses.detect import DetectionLossConfig, LossState, detection_loss, init_loss_state
from bsyolo_tpu.ops.normalize import normalize_image_batch

Array = jax.Array


@flax_dataclass
class TrainState:
    step: Array  # () int32, global iteration ni
    params: Any
    batch_stats: Any
    ema_params: Any
    ema_updates: Array  # () int32, optimizer-step count (EMA decay input)
    slot0: Any  # SGD momentum buf | AdamW m
    slot1: Any  # AdamW v (zeros under SGD)
    acc_grads: Any
    last_opt_step: Array  # () int32
    loss_state: LossState


class StepConfig(NamedTuple):
    loss: DetectionLossConfig
    optim: O.OptimConfig
    batch_size: int  # global batch size
    nb: int  # batches per epoch (for epoch-fraction LR schedule)
    nw: int  # warmup iterations = max(round(warmup_epochs*nb), 100)
    use_adamw: bool
    weight_decay: float  # already scaled by batch*accumulate/nbs
    max_grad_norm: float = 10.0
    pass_targets: bool = False  # feed gt into model.apply (RT-DETR CDN)
    needs_dropout_rng: bool = False  # model uses nn.Dropout at train time
    frozen: tuple = ()  # top-level param keys ("m0", ...) excluded from updates
    #   (reference trainer.py:252 freeze-layers: requires_grad=False params
    #   are absent from the torch optimizer step, so here their grads are
    #   zeroed before clipping AND their values restored after the update —
    #   decoupled weight decay must not erode frozen weights either)
    remat: Any = False  # rematerialize the forward during the backward:
    #   True/'full' saves no activations (jax.checkpoint nothing_saveable),
    #   trading +1 forward of FLOPs for HBM activation traffic. Measured
    #   FASTER than the default on TPU v5e at yolo11n/640 (fwd+bwd 92.1 vs
    #   96.4 ms at batch 32 — the backward is bandwidth-bound,
    #   docs/performance.md) and cuts activation memory, admitting larger
    #   batches. 'seg' saves ONLY the per-layer boundary activations the
    #   graph walk tags with checkpoint_name("bs_seg") (nn/model.py) and
    #   recomputes intra-block residuals from the nearest boundary — less
    #   recompute locality cost than 'full' (each segment's recompute runs
    #   right before its backward slice, keeping the live set small).


def remat_policy(remat):
    """Map the cfg `remat` value to a jax.checkpoint policy (None = no remat).

    False/'' -> None; True/'full' -> nothing_saveable (recompute everything
    from the input); 'seg' -> save_only_these_names("bs_seg"), keeping only
    the per-layer boundary activations the graph walk tags (nn/model.py) and
    recomputing intra-block residuals segment-locally during the backward.
    """
    if not remat:
        return None
    mode = remat.lower() if isinstance(remat, str) else "full"
    if mode in ("0", "false", "off", "none", ""):
        return None
    if mode in ("full", "true", "1"):
        return jax.checkpoint_policies.nothing_saveable
    if mode == "seg":
        return jax.checkpoint_policies.save_only_these_names("bs_seg")
    if mode == "light":
        # inverse policy: save every ordinary residual, but never STORE the
        # tagged per-layer boundary outputs — recompute them (one elementwise
        # op from the saved pre-activation) when the backward needs them.
        # Shaves the largest per-layer tensors off the activation traffic at
        # near-zero recompute cost.
        return jax.checkpoint_policies.save_anything_except_these_names("bs_seg")
    raise ValueError(
        f"remat={remat!r}: expected False/'0'/'off', True/'full', 'seg', or 'light'"
    )


def init_train_state(variables, cfg: "StepConfig" = None) -> TrainState:
    """Build the carried state. With ``cfg``, optimizer slots that the
    configured step can never read are elided (None = empty pytree):

    - ``slot1`` exists only for AdamW's second moment — under SGD it is a
      dead full-model-sized buffer (80 MB at m-width);
    - ``acc_grads`` exists only when gradient accumulation can trigger
      (nbs > batch); at nbs <= batch every step updates, so the
      accumulator is another dead model-sized buffer.

    Measured round 5: the two elisions (160 MB at m/640) are what let
    m@640 batch 128 + full remat fit a 16 GB v5e (docs/performance.md).
    Without ``cfg`` all slots are allocated (backward compatible).
    """
    params = variables["params"]
    # every field gets its own fresh buffers: the train step donates the whole
    # state (XLA rejects aliased donations), and donation would otherwise
    # delete the caller's `variables` out from under it
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
    need_slot1 = cfg is None or cfg.use_adamw
    need_acc = cfg is None or cfg.optim.nbs > cfg.batch_size
    return TrainState(
        step=jnp.int32(0),
        params=copy(params),
        batch_stats=copy(variables["batch_stats"]),
        ema_params=copy(params),
        ema_updates=jnp.int32(0),
        slot0=zeros(),
        slot1=zeros() if need_slot1 else None,
        acc_grads=zeros() if need_acc else None,
        last_opt_step=jnp.int32(-1),
        loss_state=init_loss_state(),
    )


def make_train_step(model, cfg: StepConfig, criterion: Callable = None, item_names=None,
                    jit: bool = True) -> Callable:
    """Build the jitted (state, batch) -> (state, metrics) function.

    ``jit=False`` returns the raw traceable step for callers that embed it
    in a larger compiled program (bench_train.py wraps N steps in one
    lax.scan for relay-safe scan-diff timing).

    batch: dict(img (B,H,W,3) f32 in [0,1], cls (B,M) i32,
                bboxes (B,M,4) normalized xywh, mask (B,M) f32)

    criterion(outputs, batch, loss_state, loss_cfg) -> (total, items, state);
    defaults to the detection loss.
    """
    lf = O.lr_lambda(cfg.optim)
    if criterion is None:
        criterion = lambda outputs, batch, ls, lc: detection_loss(
            outputs, batch["cls"], batch["bboxes"], batch["mask"], ls, lc
        )

    def step_fn(state: TrainState, batch) -> Tuple[TrainState, dict]:
        grp = O.param_groups(state.params)

        def loss_fn(params):
            apply_kw = {}
            if cfg.pass_targets:
                # RT-DETR CDN: gt targets + a per-step denoising rng
                apply_kw["targets"] = {
                    k: batch[k] for k in ("cls", "bboxes", "mask") if k in batch
                }
                apply_kw["rngs"] = {"dn": jax.random.fold_in(jax.random.PRNGKey(3), state.step)}
            if cfg.needs_dropout_rng:
                apply_kw.setdefault("rngs", {})["dropout"] = jax.random.fold_in(
                    jax.random.PRNGKey(7), state.step
                )
            def apply_model(p, img):
                return model.apply(
                    {"params": p, "batch_stats": state.batch_stats},
                    img,
                    train=True,
                    mutable=["batch_stats"],
                    **apply_kw,
                )

            policy = remat_policy(cfg.remat)
            if policy is not None:
                apply_model = jax.checkpoint(apply_model, policy=policy)
            outputs, mutated = apply_model(params, normalize_image_batch(batch["img"]))
            total, items, new_ls = criterion(outputs, batch, state.loss_state, cfg.loss)
            return total, (items, new_ls, mutated["batch_stats"])

        (total, (items, new_ls, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )

        if cfg.frozen:
            grads = {
                k: jax.tree_util.tree_map(jnp.zeros_like, v) if k in cfg.frozen else v
                for k, v in grads.items()
            }

        # acc_grads=None (init_train_state slot elision): accumulation can
        # never trigger at this nbs/batch, so this step's grads ARE the
        # update input and no accumulator buffer exists
        acc = grads if state.acc_grads is None else (
            jax.tree_util.tree_map(jnp.add, state.acc_grads, grads)
        )
        ni = state.step
        accumulate = O.warmup_accumulate(
            ni.astype(jnp.float32), float(cfg.nw), cfg.optim.nbs / cfg.batch_size
        )
        do_update = (ni - state.last_opt_step) >= accumulate

        epoch_f = ni.astype(jnp.float32) / float(cfg.nb)
        lr_main, lr_bias, mom = O.warmup_scalars(
            cfg.optim, ni.astype(jnp.float32), float(cfg.nw), epoch_f, lf
        )

        def apply_update(_):
            clipped, gnorm = O.clip_by_global_norm(acc, cfg.max_grad_norm)
            if cfg.use_adamw:
                new_params, s0, s1 = O.adamw_update(
                    state.params,
                    clipped,
                    state.slot0,
                    state.slot1,
                    (state.ema_updates + 1).astype(jnp.float32),
                    grp,
                    lr_main,
                    lr_bias,
                    cfg.optim.momentum,
                    cfg.weight_decay,
                )
            else:
                new_params, s0 = O.sgd_update(
                    state.params, clipped, state.slot0, grp, lr_main, lr_bias, mom, cfg.weight_decay
                )
                s1 = state.slot1
            if cfg.frozen:
                new_params = {
                    k: state.params[k] if k in cfg.frozen else v
                    for k, v in new_params.items()
                }
            new_updates = state.ema_updates + 1
            new_ema = O.ema_update(state.ema_params, new_params, new_updates)
            zeros = None if state.acc_grads is None else (
                jax.tree_util.tree_map(jnp.zeros_like, acc)
            )
            return new_params, s0, s1, new_ema, new_updates, zeros, ni, gnorm

        def no_update(_):
            return (
                state.params,
                state.slot0,
                state.slot1,
                state.ema_params,
                state.ema_updates,
                state.acc_grads if state.acc_grads is None else acc,
                state.last_opt_step,
                jnp.float32(0),
            )

        new_params, s0, s1, ema, ema_n, new_acc, last_opt, gnorm = jax.lax.cond(
            do_update, apply_update, no_update, None
        )

        new_state = TrainState(
            step=ni + 1,
            params=new_params,
            batch_stats=new_bs,
            ema_params=ema,
            ema_updates=ema_n,
            slot0=s0,
            slot1=s1,
            acc_grads=new_acc,
            last_opt_step=last_opt,
            loss_state=new_ls,
        )
        names = item_names or ("box_loss", "cls_loss", "dfl_loss", "seg_loss", "kpt_loss")
        metrics = {
            "loss": total,
            **{names[i]: items[i] for i in range(items.shape[0]) if i < len(names)},
            "lr": lr_main,
            "grad_norm": gnorm,
            "updated": do_update.astype(jnp.int32),
        }
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,)) if jit else step_fn


def make_chunked_train_step(model, cfg: StepConfig, criterion: Callable = None,
                            item_names=None) -> Callable:
    """K training steps in ONE compiled program: lax.scan of the raw step
    over a stacked (K, B, ...) batch pytree (stage with parallel.shard_chunk).

    TPU-native dispatch amortization (no reference analog — the reference's
    DDP loop is host-driven per step): every train_step dispatch pays one
    host->device round trip, and through a TPU relay that RTT is ~30-60 ms
    against a ~140 ms yolo11n@640 step — single-step dispatch leaves ~25% of
    the chip idle. One chunked call pays the RTT once for K steps and ships
    K batches in one transfer. Semantics are IDENTICAL to K sequential
    train_step calls (warmup/EMA/accumulation are functions of state.step,
    which the scan carries); pinned by tests/test_train_features.py.

    Returns jitted (state, batches) -> (state, metrics with (K,) leaves).
    """
    raw = make_train_step(model, cfg, criterion=criterion, item_names=item_names, jit=False)

    def chunk_fn(state: TrainState, batches):
        return jax.lax.scan(raw, state, batches)

    return jax.jit(chunk_fn, donate_argnums=(0,))
