"""Detection trainer shell (maps reference engine/trainer.py BaseTrainer).

The hot loop is the jitted step in train_step.py; this shell owns what the
reference does around it: dataloaders, epoch scheduling, close_mosaic,
validation on EMA weights, checkpointing, results.csv, early stopping.
Data-parallelism = mesh batch sharding (no DDP relaunch, trainer.py:217-229).
"""

from __future__ import annotations

import csv
import math
import time
from pathlib import Path
from types import SimpleNamespace
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bsyolo_tpu.cfg import get_cfg, model_yaml_path
from bsyolo_tpu.data import DataLoader, YOLODataset, load_dataset_yaml
from bsyolo_tpu.engine.optim import OptimConfig, resolve_auto
from bsyolo_tpu.engine.train_step import StepConfig, TrainState, init_train_state, make_train_step
from bsyolo_tpu.engine.validator import DetectionValidator
from bsyolo_tpu.losses import DetectionLossConfig
from bsyolo_tpu.nn import build_model, load_model_yaml, parse_model_yaml
from bsyolo_tpu.parallel import get_mesh, replicated_sharding, shard_batch
from bsyolo_tpu.parallel import dist as pdist
from bsyolo_tpu.utils import LOGGER
from bsyolo_tpu.utils.callbacks import EarlyStopping, default_callbacks


def _timed_iter(iterable, acc):
    """Yield from ``iterable``, accumulating time blocked in __next__ into
    ``acc[0]`` — measures how long the hot loop waits on the input pipeline."""
    it = iter(iterable)
    while True:
        t0 = time.perf_counter()
        try:
            batch = next(it)
        except StopIteration:
            return
        acc[0] += time.perf_counter() - t0
        yield batch


def save_checkpoint(path: Path, state: TrainState, meta: Dict, full: bool = False,
                    extras: Optional[Dict] = None):
    """Serialize {params, ema, batch_stats, counters} + meta (reference
    trainer.py:512-543 save_model; orbax-free msgpack via flax).

    With full=True the complete TrainState (optimizer slots, accumulators,
    loss state) is embedded so training can resume exactly. ``extras``:
    additional arrays the model needs at load time (e.g. a world model's
    trained-against text embeddings) — merged into the payload.
    """
    from flax import serialization

    payload = {
        "params": state.params,
        "ema_params": state.ema_params,
        "batch_stats": state.batch_stats,
        "step": state.step,
        "ema_updates": state.ema_updates,
    }
    if extras:
        payload.update(extras)
    if full:
        payload["train_state"] = serialization.to_state_dict(state)
    path.parent.mkdir(parents=True, exist_ok=True)
    blob = serialization.to_bytes(payload)
    import json

    header = json.dumps(meta).encode()
    with open(path, "wb") as f:
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        f.write(blob)


def strip_optimizer(path: Path, prefer_ema: bool = True) -> float:
    """Shrink a finished checkpoint for deployment (reference
    torch_utils.py:540 strip_optimizer): drop the embedded full TrainState
    (optimizer slots, grad accumulators) and, like the reference's
    ``model = ema``, promote the EMA weights to the canonical params.

    Returns the on-disk size reduction in MB. Idempotent; no-op on files
    that were saved without ``full=True``. Unlike the reference this is NOT
    run automatically at train end: this trainer supports resuming a
    completed run to more epochs (the reference refuses), which needs the
    optimizer slots in last.ckpt. Call it when a run is truly final.
    """
    import json

    from flax import serialization

    path = Path(path)
    before = path.stat().st_size
    payload, meta = load_checkpoint(path)
    payload.pop("train_state", None)
    if prefer_ema and payload.get("ema_params") is not None:
        payload["params"] = payload["ema_params"]
    # drop the now-duplicate EMA tree — otherwise the "shrunk" artifact
    # stores every weight twice (loaders fall back to params, which are
    # the EMA weights after the promotion above)
    payload.pop("ema_params", None)
    meta["stripped"] = True
    blob = serialization.to_bytes(payload)
    header = json.dumps(meta).encode()
    with open(path, "wb") as f:
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        f.write(blob)
    return (before - path.stat().st_size) / 1e6


def load_checkpoint(path, template=None):
    """Returns (payload, meta). With a template pytree, restores typed arrays."""
    import json

    from flax import serialization

    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        meta = json.loads(f.read(n).decode())
        blob = f.read()
    if template is not None:
        payload = serialization.from_bytes(template, blob)
    else:
        payload = serialization.msgpack_restore(blob)
    return payload, meta


class DetectionTrainer:
    """Train a detection model from a model YAML + dataset YAML."""

    def __init__(self, overrides: Optional[Dict] = None, callbacks=None, text_embeddings=None):
        self.args = get_cfg(overrides=overrides or {})
        self.save_dir = Path(self.args.project or "runs/detect") / (self.args.name or "train")
        self.best_fitness = 0.0
        self.epoch = 0
        self.metrics = None
        self.epoch_metrics = None
        self.callbacks = callbacks or default_callbacks()
        self.stopper = EarlyStopping(self.args.patience)
        # world (open-vocab) training: optional precomputed (nc, 512) CLIP
        # class-name embeddings; hashed n-gram fallback otherwise
        self._text_embeddings = text_embeddings
        self.txt_feats = None

    def add_callback(self, event: str, fn):
        self.callbacks.add(event, fn)

    def setup(self):
        args = self.args
        pdist.initialize()  # no-op single-process (reference _setup_ddp analog)
        self.world = pdist.process_count()
        self.rank = pdist.process_index()
        data = load_dataset_yaml(args.data)
        self.data = data
        yaml_path = model_yaml_path(str(args.model))
        d = load_model_yaml(yaml_path)
        d["nc"] = data["nc"]
        if data.get("names"):
            d["names"] = data["names"]
        self.spec = parse_model_yaml(d, scale=d.get("scale", ""))
        import jax.numpy as jnp

        dtype = jnp.bfloat16 if args.amp else jnp.float32
        self.model, variables = build_model(
            self.spec, img_size=args.imgsz, dtype=dtype, seed=args.seed
        )
        if isinstance(args.pretrained, str) and args.pretrained.lower() not in ("true", "false", ""):
            variables = self._load_pretrained(variables, args.pretrained)

        if any(l.module in ("C2fAttn", "ImagePoolingAttn", "WorldDetect") for l in self.spec.layers):
            # WorldTrainer analog (reference models/yolo/world/train.py): train
            # the open-vocab graph against the dataset's class-name text
            # embeddings. The reference re-encodes the same names through CLIP
            # every step (preprocess_batch); here the (1, nc, 512) text matrix
            # is a constant baked into the compiled train step. CLIP is not in
            # this image: callers inject embeddings, else the deterministic
            # hashed n-gram fallback drives the full contrastive path.
            names = [str(v) for v in (data.get("names") or {}).values()] or [
                str(i) for i in range(data["nc"])
            ]
            emb = self._text_embeddings
            if emb is not None and not hasattr(emb, "ndim") and not isinstance(emb, (list, tuple)):
                # a saved {name: vector} table (.npz path or dict): resolve
                # the dataset's class names against it, "/"-synonyms averaged
                from bsyolo_tpu.utils.text_embed import resolve_text_embeddings

                emb = resolve_text_embeddings(names, emb)
            if emb is None:
                from bsyolo_tpu.utils.text_embed import hashed_text_embeddings

                LOGGER.warning(
                    "world training without text_embeddings: using hashed "
                    "n-gram vectors (NOT CLIP; lexical only)"
                )
                # "/"-joined synonyms (reference YOLOMultiModalDataset
                # update_labels_info, data/dataset.py:270): embed each synonym,
                # average per class
                emb = np.stack(
                    [hashed_text_embeddings(n.split("/")).mean(0) for n in names]
                )
            emb = np.asarray(emb, np.float32)
            if emb.shape[0] != len(names):
                raise ValueError(f"text_embeddings rows {emb.shape[0]} != classes {len(names)}")
            emb = emb / (np.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12)
            self.txt_feats = jnp.asarray(emb[None])
            from bsyolo_tpu.nn.model import TextConditioned

            self.model = TextConditioned(self.model, self.txt_feats)

        if args.batch is not None and int(args.batch) < 1:
            args.batch = self._autobatch(variables)

        task = self.spec.task
        train_ds = YOLODataset(
            data["train"],
            imgsz=args.imgsz,
            augment=True,
            hyp=vars(args),
            max_gt=args.max_gt,
            single_cls=args.single_cls,
            fraction=args.fraction,
            task=task,
            mask_ratio=args.mask_ratio,
            flip_idx=data.get("flip_idx"),
            cache=getattr(args, "cache", False),
        )
        val_ds = YOLODataset(
            data["val"], imgsz=args.imgsz, augment=False, max_gt=args.max_gt,
            single_cls=args.single_cls, task=task, mask_ratio=args.mask_ratio,
            flip_idx=data.get("flip_idx"),
        )
        # multi-host: args.batch is the GLOBAL batch; each host loads its shard
        local_batch = pdist.local_batch_size(args.batch) if self.world > 1 else args.batch
        shard = (self.rank, self.world) if self.world > 1 else None
        # cap workers at cores-1: forked assemblers beyond that only thrash
        import os as _os

        workers = min(int(getattr(args, "workers", 0) or 0), max((_os.cpu_count() or 1) - 1, 0))
        self.train_loader = DataLoader(
            train_ds, local_batch, shuffle=True, seed=args.seed, workers=workers, shard=shard
        )
        # validation runs the FULL val set on every host (params are
        # replicated so each host evaluates identically — same fitness, same
        # early-stop decision, no rank-0 broadcast needed)
        self.val_loader = DataLoader(val_ds, local_batch, shuffle=False, drop_last=False)
        nb = max(len(self.train_loader), 1)
        self.nb = nb

        opt = OptimConfig(
            name=args.optimizer,
            lr0=args.lr0,
            lrf=args.lrf,
            momentum=args.momentum,
            weight_decay=args.weight_decay,
            warmup_epochs=args.warmup_epochs,
            warmup_momentum=args.warmup_momentum,
            warmup_bias_lr=args.warmup_bias_lr,
            cos_lr=args.cos_lr,
            epochs=args.epochs,
            nbs=args.nbs,
        )
        opt = resolve_auto(opt, self.spec.nc, args.batch, nb)
        accumulate = max(round(args.nbs / args.batch), 1)
        wd = opt.weight_decay * args.batch * accumulate / args.nbs
        loss_cfg = DetectionLossConfig(
            nc=self.spec.nc,
            strides=self.spec.head_strides,
            reg_max=getattr(self.spec, "reg_max", 16),  # 17-bin NAS NDFL
            box=args.box,
            cls=args.cls,
            dfl=args.dfl,
            nwd_loss=args.nwdloss,
            iou_ratio=args.iou_ratio,
            assigner_bf16=bool(getattr(args, "assigner_bf16", False)),
        )
        nw = max(round(opt.warmup_epochs * nb), 100) if opt.warmup_epochs > 0 else 0
        self.step_cfg = StepConfig(
            loss=loss_cfg,
            optim=opt,
            batch_size=args.batch,
            nb=nb,
            nw=nw,
            use_adamw=opt.name in ("AdamW", "Adam", "NAdam", "RAdam"),
            weight_decay=wd,
            frozen=self._frozen_keys(variables),
            remat=getattr(args, "remat", False) or False,
        )
        criterion = None
        item_names = None
        if task == "segment":
            from bsyolo_tpu.losses.segment import segmentation_loss

            nm = self.spec.head.args[1]

            def criterion(outputs, batch, ls, lc):
                return segmentation_loss(
                    outputs, batch["cls"], batch["bboxes"], batch["mask"], batch["masks"],
                    ls, lc, nm=nm, overlap=args.overlap_mask,
                )

            item_names = ("box_loss", "seg_loss", "cls_loss", "dfl_loss")
        elif task == "pose":
            from bsyolo_tpu.losses.pose import pose_loss

            kpt_shape = self.spec.kpt_shape

            def criterion(outputs, batch, ls, lc):
                return pose_loss(
                    outputs, batch["cls"], batch["bboxes"], batch["mask"],
                    batch["keypoints"], ls, lc, kpt_shape=kpt_shape,
                    pose_gain=args.pose, kobj_gain=args.kobj,
                )

            item_names = ("box_loss", "pose_loss", "kobj_loss", "cls_loss", "dfl_loss")
        elif task == "obb":
            from bsyolo_tpu.losses.obb import obb_loss

            def criterion(outputs, batch, ls, lc):
                return obb_loss(
                    outputs, batch["cls"], batch["rboxes"], batch["mask"], ls, lc
                )

        if self.spec.head.module == "RTDETRDecoder":
            from bsyolo_tpu.losses.detr import rtdetr_loss

            self.step_cfg = self.step_cfg._replace(pass_targets=True)

            def criterion(outputs, batch, ls, lc):
                total, items = rtdetr_loss(outputs, batch["cls"], batch["bboxes"], batch["mask"])
                return total, items, ls

            item_names = ("cls_loss", "bbox_loss", "giou_loss")
        if self.spec.head.module == "v10Detect":
            from bsyolo_tpu.losses.detect import detection_loss

            def criterion(outputs, batch, ls, lc):
                """E2EDetectLoss (reference loss.py:852): one2many topk-10 +
                one2one topk-1. The EMA-slide state is carried from the
                one2many branch and read by one2one (the reference keeps two
                independent EMA states; only the sliding BCE weight differs)."""
                t1, i1, new_ls = detection_loss(
                    outputs["one2many"], batch["cls"], batch["bboxes"], batch["mask"], ls, lc
                )
                t2, i2, _ = detection_loss(
                    outputs["one2one"], batch["cls"], batch["bboxes"], batch["mask"],
                    ls, lc._replace(tal_topk=1),
                )
                return t1 + t2, i1 + i2, new_ls

        self.train_step = make_train_step(
            self.model, self.step_cfg, criterion=criterion, item_names=item_names
        )
        # chunked dispatch (TPU addition, default.yaml chunk_steps): K steps
        # per compiled call amortize the per-dispatch host->device RTT.
        # Single-host only (multi-host staging needs per-host global arrays)
        # and off under multi_scale (bucketed shapes recompile per size).
        self._chunk_step = None
        self.chunk_steps = int(getattr(args, "chunk_steps", 0) or 0)
        if self.chunk_steps > 1 and self.world == 1 and not args.multi_scale:
            from bsyolo_tpu.engine.train_step import make_chunked_train_step

            self._chunk_step = make_chunked_train_step(
                self.model, self.step_cfg, criterion=criterion, item_names=item_names
            )
        self.state = init_train_state(variables, self.step_cfg)
        self.mesh = get_mesh()
        self.state = jax.device_put(self.state, replicated_sharding(self.mesh))
        if task == "segment":
            from bsyolo_tpu.engine.validator import SegmentationValidator

            self.validator = SegmentationValidator(self.model, self.spec, names=data.get("names"))
        elif task == "obb":
            from bsyolo_tpu.engine.validator import OBBValidator

            self.validator = OBBValidator(self.model, self.spec, names=data.get("names"))
        elif task == "pose":
            from bsyolo_tpu.engine.validator import PoseValidator

            self.validator = PoseValidator(self.model, self.spec, names=data.get("names"))
        else:
            self.validator = DetectionValidator(self.model, self.spec, names=data.get("names"))
        self.csv_path = self.save_dir / "results.csv"

        # multi_scale (reference detect/train.py preprocess_batch): the
        # reference draws a continuous size in [0.5, 1.5]*imgsz each step —
        # on TPU that is a recompile per novel shape, so the TPU-native form
        # is a small static bucket set (each bucket compiles once, cached
        # persistently). Detect-family only: rescaling imgs without the
        # proto-res mask tensors would silently corrupt segment training.
        self._ms_sizes = None
        self._ms_fns = {}
        if args.multi_scale and task == "detect":
            self._ms_sizes = sorted(
                {max(32, int(round(args.imgsz * f / 32)) * 32) for f in (0.5, 0.75, 1.0, 1.25, 1.5)}
            )
            LOGGER.info(f"multi_scale: bucketed sizes {self._ms_sizes}")

        if self.args.resume:
            self._resume()

    def _apply_multi_scale(self, batch, ni: int):
        """Device-side bilinear rescale of the image batch to a random
        bucket size; normalized xywh labels are scale-invariant so only the
        pixels move. One compile per bucket (jit caches by shape)."""
        sz = int(self._ms_sizes[np.random.default_rng((self.args.seed, ni)).integers(len(self._ms_sizes))])
        if sz == int(batch["img"].shape[1]):
            return batch
        fn = self._ms_fns.get(sz)
        if fn is None:
            import jax.image

            def resize(x, _sz=sz):
                from bsyolo_tpu.ops.normalize import normalize_image_batch

                x = normalize_image_batch(x)  # bilinear on floats, not uint8
                b = x.shape[0]
                return jax.image.resize(x, (b, _sz, _sz, x.shape[3]), method="bilinear")

            fn = self._ms_fns[sz] = jax.jit(resize)
        out = dict(batch)
        out["img"] = fn(batch["img"])
        return out

    def _load_pretrained(self, variables, path: str):
        """args.pretrained=<path>: warm-start from a .ckpt (EMA preferred,
        reference-style) or a reference .pt via the torch converter. Leaves
        whose path or shape differ (e.g. a different-nc head) keep their
        fresh init — the reference's shape-filtered intersect_dicts load."""
        if path.endswith(".pt"):
            from bsyolo_tpu.utils.torch_weights import convert_state_dict, load_torch_checkpoint

            sd, _ = load_torch_checkpoint(path)
            variables, report = convert_state_dict(sd, variables, strict=False)
            LOGGER.info(
                f"pretrained {path}: {len(report.get('missing', ()))} params kept fresh init"
            )
            return variables
        payload, _ = load_checkpoint(path)
        src = {"params": payload.get("ema_params", payload.get("params")),
               "batch_stats": payload.get("batch_stats", {})}

        def flat(tree, prefix=()):
            out = {}
            for k, v in (tree.items() if hasattr(tree, "items") else ()):
                if hasattr(v, "items"):
                    out.update(flat(v, prefix + (k,)))
                else:
                    out[prefix + (k,)] = v
            return out

        srcf = {c: flat(src[c]) for c in src}
        copied = skipped = 0

        def merge(tree, col, prefix=()):
            nonlocal copied, skipped
            out = {}
            for k, v in tree.items():
                if hasattr(v, "items"):
                    out[k] = merge(v, col, prefix + (k,))
                else:
                    s = srcf.get(col, {}).get(prefix + (k,))
                    if s is not None and getattr(s, "shape", None) == v.shape:
                        out[k] = jnp.asarray(s, v.dtype)
                        copied += 1
                    else:
                        out[k] = v
                        skipped += 1
            return out

        variables = {c: merge(variables[c], c) for c in variables}
        LOGGER.info(f"pretrained {path}: {copied} tensors loaded, {skipped} kept fresh init")
        return variables

    def _frozen_keys(self, variables) -> tuple:
        """Resolve args.freeze (int = first-N layers, or list of layer
        indices; reference trainer.py:252-262) to top-level param keys."""
        fz = getattr(self.args, "freeze", None)
        if not fz:
            return ()
        idxs = range(int(fz)) if isinstance(fz, (int, float)) or str(fz).isdigit() else [
            int(i) for i in (fz if isinstance(fz, (list, tuple)) else str(fz).split(","))
        ]
        keys = tuple(k for k in ({f"m{i}" for i in idxs} & set(variables["params"].keys())))
        if keys:
            LOGGER.info(f"freezing layers {sorted(keys)} (no grads, no decay)")
        return keys

    def _profile_tick(self, n: int):
        """profile=True: open the xprof trace after the first (compiling)
        step, close it ~3 steady-state steps later."""
        if self._profile_pending and n >= 1:
            (self.save_dir / "profile").mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(str(self.save_dir / "profile"))
            self._profile_pending = False
            self._profiling = True
            self._profile_stop_at = n + 3
        elif self._profiling and n >= self._profile_stop_at:
            self._profile_stop()

    def _profile_stop(self):
        if getattr(self, "_profiling", False):
            jax.block_until_ready(self.state.params)
            jax.profiler.stop_trace()
            self._profiling = False
            LOGGER.info(
                f"profile=True: xprof trace (post-compile steps) written to "
                f"{self.save_dir / 'profile'} — open with TensorBoard's profile plugin"
            )

    def _run_chunk(self, buf, em) -> int:
        """Stage K host batches as one (K, B, ...) transfer and run the
        K-step compiled scan; fold the stacked (K,) loss metrics into em."""
        from bsyolo_tpu.parallel import shard_chunk

        batches = {k: np.stack([np.asarray(b[k]) for b in buf]) for k in buf[0]}
        self.state, m = self._chunk_step(self.state, shard_chunk(batches, self.mesh))
        for k, v in m.items():
            if k.endswith("loss"):  # lazy sum of the (K,) stacked metrics
                em[k] = em.get(k, 0.0) + jnp.sum(v)
        return len(buf)

    def _autobatch(self, variables) -> int:
        """Resolve batch=-1 via the compiler memory model (reference
        trainer.py:476-484 check_train_batch_size). Probes fwd+bwd memory at
        batch 1 and 2 and fits a linear model — no trial OOMs."""
        import jax
        import jax.numpy as jnp

        from bsyolo_tpu.utils.autobatch import autobatch

        model, imgsz = self.model, self.args.imgsz

        apply_model = lambda vv, x: model.apply(vv, x, train=True, mutable=["batch_stats"])[0]
        from bsyolo_tpu.engine.train_step import remat_policy

        policy = remat_policy(getattr(self.args, "remat", False) or False)
        if policy is not None:
            # probe the step the trainer will actually run: remat frees
            # (full) or shrinks (seg) the activation footprint, so the fitted
            # memory line is flatter and batch=-1 resolves larger
            apply_model = jax.checkpoint(apply_model, policy=policy)

        def probe(v, x):
            def loss_fn(vv):
                out = apply_model(vv, x)
                leaves = jax.tree_util.tree_leaves(out)
                return sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves)

            return jax.value_and_grad(loss_fn)(v)[0]

        batch = autobatch(
            lambda b: (variables, jnp.zeros((b, imgsz, imgsz, 3), jnp.float32)), probe
        )
        LOGGER.info(f"autobatch: batch=-1 resolved to {batch} at imgsz={imgsz}")
        return batch

    def _resume(self):
        """Restore a full TrainState from last.ckpt (reference trainer.py:723)."""
        last = self.save_dir / "weights" / "last.ckpt"
        if not last.exists():
            LOGGER.warning(f"resume requested but {last} not found; starting fresh")
            return
        payload, meta = load_checkpoint(last)
        if "train_state" not in payload:
            LOGGER.warning(f"{last} lacks a full train state; resuming weights only")
        from flax import serialization

        if "train_state" in payload:
            self.state = serialization.from_state_dict(self.state, payload["train_state"])
        else:
            self.state = self.state.replace(
                params=serialization.from_state_dict(self.state.params, payload["params"]),
                ema_params=serialization.from_state_dict(self.state.ema_params, payload["ema_params"]),
                batch_stats=serialization.from_state_dict(self.state.batch_stats, payload["batch_stats"]),
            )
        self.start_epoch = int(meta.get("epoch", -1)) + 1
        self.best_fitness = float(meta.get("best_fitness", meta.get("fitness", 0.0)))
        LOGGER.info(f"resumed from {last} at epoch {self.start_epoch}")

    def train(self):
        self.start_epoch = 0
        self.setup()
        args = self.args
        self.callbacks.run("on_train_start", self)
        LOGGER.info(
            f"training {args.model} on {args.data}: {args.epochs} epochs, batch {args.batch}, "
            f"imgsz {args.imgsz}, {len(self.train_loader.dataset)} train images, "
            f"{self.step_cfg.optim.name} lr0={self.step_cfg.optim.lr0}"
        )
        t_start = time.time()
        stop_epoch = args.epochs
        # profile=True (reference default.yaml:35 profiles ONNX/TRT speeds
        # during train; the TPU-native mapping per SURVEY §5.1 is an xprof
        # trace): capture steps 2-4 of the first epoch — past the compile —
        # into save_dir/profile, loadable by TensorBoard's profile plugin.
        self._profiling = False
        self._profile_pending = bool(getattr(args, "profile", False))
        for epoch in range(self.start_epoch, args.epochs):
            self.epoch = epoch
            self.callbacks.run("on_train_epoch_start", self)
            if args.close_mosaic and epoch == max(args.epochs - args.close_mosaic, 0):
                self.train_loader.close_mosaic()
            self.train_loader.set_epoch(epoch)
            em = {}
            n = 0
            n_seen = 0  # host batches seen (n lags while a chunk buffers)
            chunk_buf = []
            loader_wait = [0.0]  # host time blocked on the input pipeline
            epoch_t0 = time.time()
            for batch in _timed_iter(self.train_loader, loader_wait):
                if args.plots and epoch == 0 and n_seen < 3 and self.rank == 0:
                    # train_batch{0,1,2}.jpg mosaics (reference trainer
                    # plot_training_samples)
                    from bsyolo_tpu.utils.plotting import plot_images

                    plot_images(
                        {k: np.asarray(v) for k, v in batch.items()
                         if k in ("img", "cls", "bboxes", "mask")},
                        {i2: nm for i2, nm in enumerate(self.spec.names)},
                        save_path=str(self.save_dir / f"train_batch{n_seen}.jpg"),
                    )
                n_seen += 1
                if self._chunk_step is not None:
                    chunk_buf.append(batch)
                    if len(chunk_buf) == self.chunk_steps:
                        n += self._run_chunk(chunk_buf, em)
                        chunk_buf = []
                        self._profile_tick(n)
                    continue
                if self.world > 1:
                    batch = pdist.host_local_batch_to_global(batch, self.mesh)
                else:
                    batch = shard_batch(batch, self.mesh)
                if self._ms_sizes:
                    batch = self._apply_multi_scale(batch, epoch * self.nb + n)
                self.state, m = self.train_step(self.state, batch)
                n += 1
                for k, v in m.items():
                    if k.endswith("loss"):
                        # lazy device-side accumulation: jax scalars are
                        # futures, so adding them does NOT block — the loop
                        # never waits on the device (one fetch per epoch
                        # below). float() here would cost one round trip
                        # per step.
                        em[k] = em.get(k, 0.0) + v
                self._profile_tick(n)
            for batch in chunk_buf:  # epoch tail shorter than a chunk
                self.state, m = self.train_step(self.state, shard_batch(batch, self.mesh))
                n += 1
                for k, v in m.items():
                    if k.endswith("loss"):
                        em[k] = em.get(k, 0.0) + v
            self._profile_stop()  # short first epoch: close the trace anyway
            em = {k: float(v) / max(n, 1) for k, v in em.items()}

            # input-pipeline underfeed warning (VERDICT r4 #8): epoch 0 is
            # dominated by compilation, so judge from epoch 1 on. Steps
            # dispatch asynchronously, so host time blocked inside the
            # loader's __next__ is device idle time once the dispatch queue
            # drains — if it dominates the epoch, the chip is starved.
            epoch_wall = time.time() - epoch_t0
            frac = loader_wait[0] / max(epoch_wall, 1e-9)
            if (epoch > self.start_epoch and frac > 0.5 and epoch_wall > 2.0
                    and not getattr(self, "_underfeed_warned", False)):
                self._underfeed_warned = True
                LOGGER.warning(
                    f"input pipeline underfeeds the device: {loader_wait[0]:.1f}s of the "
                    f"{epoch_wall:.1f}s epoch ({100 * frac:.0f}%) spent waiting on the "
                    f"loader. Try cache='ram' (or 'disk'), more workers, or qualify "
                    f"this host with examples/bench_loader.py --record"
                )

            self.callbacks.run("on_train_epoch_end", self)
            fitness = 0.0
            if args.val:
                variables = {"params": self.state.ema_params, "batch_stats": self.state.batch_stats}
                if self.world > 1:
                    # fetch replicated params to host so validation runs as a
                    # process-local computation (a rank-gated jit on global
                    # arrays would deadlock the other hosts)
                    variables = jax.tree_util.tree_map(np.asarray, variables)
                self.metrics = self.validator(variables, self.val_loader)
                fitness = self.metrics.fitness
            if self.rank == 0:
                self._log_epoch(epoch, em, fitness)
            self.epoch_metrics = {"train/" + k: v for k, v in em.items()}
            self.epoch_metrics["fitness"] = fitness
            if self.metrics is not None:
                self.epoch_metrics.update(
                    {k: float(v) for k, v in zip(self.metrics.keys, self.metrics.mean_results())}
                )
            self.callbacks.run("on_fit_epoch_end", self)

            if args.save and self.rank == 0:
                if fitness >= self.best_fitness:
                    self.best_fitness = fitness
                meta = {
                    "epoch": epoch,
                    "fitness": fitness,
                    "best_fitness": self.best_fitness,
                    "args": {k: str(v) for k, v in vars(args).items()},
                    "names": [str(v) for v in (self.data.get("names") or {}).values()],
                }
                # a world model is only meaningful with the text it trained
                # against: embed the matrix in the ckpt (reloaders re-wrap)
                extras = (
                    {"txt_feats": np.asarray(self.txt_feats)}
                    if self.txt_feats is not None
                    else None
                )
                save_checkpoint(
                    self.save_dir / "weights" / "last.ckpt", self.state, meta,
                    full=True, extras=extras,
                )
                if fitness >= self.best_fitness:
                    save_checkpoint(
                        self.save_dir / "weights" / "best.ckpt", self.state, meta, extras=extras
                    )
                sp = int(getattr(args, "save_period", -1) or -1)
                if sp > 0 and epoch % sp == 0:
                    # periodic epoch{N} snapshot (reference trainer.py:547)
                    save_checkpoint(
                        self.save_dir / "weights" / f"epoch{epoch}.ckpt", self.state, meta,
                        extras=extras,
                    )
                self.callbacks.run("on_model_save", self)

            if self.stopper(epoch, fitness):
                LOGGER.info(
                    f"early stopping at epoch {epoch} (no improvement for {self.stopper.patience} epochs)"
                )
                stop_epoch = epoch + 1
                break
            if args.time:
                # wall clocks differ per host: rank 0 decides, all hosts agree
                # (the reference's broadcast_object_list stop flag, trainer.py:399)
                over = float((time.time() - t_start) / 3600 > args.time)
                if self.world > 1:
                    over = pdist.broadcast_scalar(over, self.mesh)
                if over:
                    stop_epoch = epoch + 1
                    break
        self.callbacks.run("on_train_end", self)
        if args.plots and self.csv_path.exists():
            from bsyolo_tpu.utils.plotting import plot_results

            plot_results(self.csv_path)
        if (args.plots and args.val and self.rank == 0
                and hasattr(self.validator, "plots")):
            # final plotted eval (reference trainer.py:675 final_eval writes
            # confusion matrix + curves into the run dir). plots/save_dir are
            # read at __call__ time, so reusing the epoch validator keeps its
            # compiled forward — no second XLA compile, one extra val pass.
            variables = {"params": self.state.ema_params, "batch_stats": self.state.batch_stats}
            if self.world > 1:
                variables = jax.tree_util.tree_map(np.asarray, variables)
            self.validator.plots = True
            self.validator.save_dir = str(self.save_dir)
            self.validator(variables, self.val_loader)
        LOGGER.info(f"done: {stop_epoch} epochs, best fitness {self.best_fitness:.4f}")
        return self.metrics

    def _log_epoch(self, epoch, em, fitness):
        row = {"epoch": epoch, **{k: round(v, 5) for k, v in em.items()}, "fitness": round(fitness, 5)}
        if self.metrics is not None:
            for k, v in zip(self.metrics.keys, self.metrics.mean_results()):
                row[k] = round(float(v), 5)
        self.csv_path.parent.mkdir(parents=True, exist_ok=True)
        write_header = not self.csv_path.exists()
        with open(self.csv_path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(row.keys()))
            if write_header:
                w.writeheader()
            w.writerow(row)
        LOGGER.info(
            f"epoch {epoch}: loss {em.get('loss', 0):.3f} "
            f"(box {em.get('box_loss', 0):.3f} cls {em.get('cls_loss', 0):.3f} "
            f"dfl {em.get('dfl_loss', 0):.3f}) fitness {fitness:.4f}"
        )
