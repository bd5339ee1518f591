"""Classification task engine (reference models/yolo/classify/{train,val}.py).

Reuses the generic jitted train step with the cross-entropy criterion; the
validator computes top-1/top-5 accuracy (reference ClassifyMetrics).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bsyolo_tpu.cfg import get_cfg, model_yaml_path
from bsyolo_tpu.data.classify import ClassificationDataset, ClassifyLoader
from bsyolo_tpu.engine.optim import OptimConfig, resolve_auto
from bsyolo_tpu.engine.train_step import StepConfig, init_train_state, make_train_step
from bsyolo_tpu.engine.trainer import save_checkpoint
from bsyolo_tpu.losses import DetectionLossConfig
from bsyolo_tpu.losses.classify import classification_loss
from bsyolo_tpu.nn import build_model, load_model_yaml, parse_model_yaml
from bsyolo_tpu.utils import LOGGER


class ClassifyMetrics:
    """top-1/top-5 accuracy (reference utils/metrics.py:1253)."""

    def __init__(self):
        self.top1 = 0.0
        self.top5 = 0.0

    def process(self, correct1: int, correct5: int, total: int):
        self.top1 = correct1 / max(total, 1)
        self.top5 = correct5 / max(total, 1)

    @property
    def fitness(self):
        return (self.top1 + self.top5) / 2

    @property
    def results_dict(self):
        return {"metrics/accuracy_top1": self.top1, "metrics/accuracy_top5": self.top5, "fitness": self.fitness}


class ClassificationValidator:
    def __init__(self, model):
        self.model = model
        self._fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))

    def __call__(self, variables, loader) -> ClassifyMetrics:
        c1 = c5 = total = 0
        for batch in loader:
            logits = np.asarray(self._fwd(variables, jnp.asarray(batch["img"])))
            top5 = np.argsort(-logits, axis=-1)[:, :5]
            labels = batch["cls"]
            c1 += int((top5[:, 0] == labels).sum())
            c5 += int((top5 == labels[:, None]).any(-1).sum())
            total += len(labels)
        m = ClassifyMetrics()
        m.process(c1, c5, total)
        return m


class ClassificationTrainer:
    """Train a classifier from a folder-per-class dataset root with
    data/<train|val>/<class>/ images (reference classify/train.py)."""

    def __init__(self, overrides: Optional[Dict] = None, callbacks=None):
        from bsyolo_tpu.utils.callbacks import default_callbacks

        self.args = get_cfg(overrides=overrides or {})
        self.save_dir = Path(self.args.project or "runs/classify") / (self.args.name or "train")
        self.metrics = None
        self.best_fitness = 0.0
        self.callbacks = callbacks or default_callbacks()

    def add_callback(self, event: str, fn):
        self.callbacks.add(event, fn)

    def train(self):
        args = self.args
        root = Path(args.data)
        aa = getattr(args, "auto_augment", None)
        if aa and str(aa).lower() in ("autoaugment", "augmix"):
            # torchvision's learned policy tables aren't available offline;
            # the randaugment op suite is (data/photometric.py:rand_augment)
            LOGGER.info(f"auto_augment={aa}: using the randaugment op suite")
        train_ds = ClassificationDataset(
            root / "train", imgsz=args.imgsz, augment=True,
            auto_augment=(str(aa) if aa else None),
            erasing=float(getattr(args, "erasing", 0.0) or 0.0),
        )
        val_dir = root / ("val" if (root / "val").exists() else "test")
        val_ds = ClassificationDataset(
            val_dir, imgsz=args.imgsz, augment=False,
            crop_fraction=float(getattr(args, "crop_fraction", 1.0) or 1.0),
        )
        names = train_ds.class_names
        nc = len(names)

        d = load_model_yaml(model_yaml_path(str(args.model)))
        d["nc"] = nc
        d["names"] = names
        spec = parse_model_yaml(d, scale=d.get("scale", ""))
        assert spec.task == "classify", f"model {args.model} is not a classify graph"
        if float(getattr(args, "dropout", 0.0) or 0.0) > 0:
            # reference classify/train.py get_model: args.dropout sets the
            # Classify head's Dropout rate for training
            import dataclasses

            spec = dataclasses.replace(spec, dropout=float(args.dropout))
        self.spec = spec
        dtype = jnp.bfloat16 if args.amp else jnp.float32
        self.model, variables = build_model(spec, img_size=args.imgsz, dtype=dtype, seed=args.seed)

        train_loader = ClassifyLoader(train_ds, args.batch, seed=args.seed)
        val_loader = ClassifyLoader(val_ds, args.batch, shuffle=False, drop_last=False)
        nb = max(len(train_loader), 1)
        opt = resolve_auto(
            OptimConfig(
                name=args.optimizer,
                lr0=args.lr0,
                lrf=args.lrf,
                momentum=args.momentum,
                weight_decay=args.weight_decay,
                warmup_epochs=args.warmup_epochs,
                cos_lr=args.cos_lr,
                epochs=args.epochs,
                nbs=args.nbs,
            ),
            nc,
            args.batch,
            nb,
        )
        accumulate = max(round(args.nbs / args.batch), 1)
        step_cfg = StepConfig(
            loss=DetectionLossConfig(nc=nc, strides=(8,)),  # unused by the CE criterion
            optim=opt,
            batch_size=args.batch,
            nb=nb,
            nw=max(round(opt.warmup_epochs * nb), 100) if opt.warmup_epochs > 0 else 0,
            use_adamw=opt.name in ("AdamW", "Adam", "NAdam", "RAdam"),
            weight_decay=opt.weight_decay * args.batch * accumulate / args.nbs,
            needs_dropout_rng=float(getattr(args, "dropout", 0.0) or 0.0) > 0,
        )
        criterion = lambda logits, batch, ls, lc: classification_loss(logits, batch["cls"], ls, lc)
        step = make_train_step(self.model, step_cfg, criterion=criterion)
        state = init_train_state(variables, step_cfg)
        validator = ClassificationValidator(self.model)

        LOGGER.info(f"classify train: {nc} classes, {len(train_ds)} images, {args.epochs} epochs")
        self.callbacks.run("on_train_start", self)
        for epoch in range(args.epochs):
            self.epoch = epoch
            self.callbacks.run("on_train_epoch_start", self)
            train_loader.set_epoch(epoch)
            tot = n = 0
            for batch in train_loader:
                batch = {"img": jnp.asarray(batch["img"]), "cls": jnp.asarray(batch["cls"])}
                state, m = step(state, batch)
                tot += m["loss"]  # lazy device scalar: no per-step sync
                n += 1
            tot = float(tot)
            variables_eval = {"params": state.ema_params, "batch_stats": state.batch_stats}
            self.callbacks.run("on_train_epoch_end", self)
            self.metrics = validator(variables_eval, val_loader)
            fitness = self.metrics.fitness
            self.epoch_metrics = {"fitness": fitness, "top1": self.metrics.top1, "top5": self.metrics.top5}
            self.callbacks.run("on_fit_epoch_end", self)
            LOGGER.info(
                f"epoch {epoch}: loss {tot/max(n,1):.4f} top1 {self.metrics.top1:.3f} top5 {self.metrics.top5:.3f}"
            )
            if args.save:
                meta = {"epoch": epoch, "fitness": fitness, "args": {"model": str(args.model)}}
                save_checkpoint(self.save_dir / "weights" / "last.ckpt", state, meta)
                if fitness >= self.best_fitness:
                    self.best_fitness = fitness
                    save_checkpoint(self.save_dir / "weights" / "best.ckpt", state, meta)
                self.callbacks.run("on_model_save", self)
        self.state = state
        self.callbacks.run("on_train_end", self)
        return self.metrics
