"""Torch-side TRAINING oracle: the reference's training loop distilled.

Mirrors the reference trainer semantics step for step — build_optimizer
param groups (engine/trainer.py:758-818), per-iteration warmup interpolation
(:355-367), accumulate-gated optimizer step with grad clip 10.0 (:390,
:585-597), ModelEMA (utils/torch_utils.py:502), linear lr schedule (:209) —
driving the AST-extracted reference loss (utils/loss.py:318) on the
AST-extracted reference model graph (ref_torch_model.RefGraph).

Together with the weight converter this gives an end-to-end PyTorch oracle
for TRAINING-DYNAMICS parity: train this and DetectionTrainer on the same
batches and compare mAP trajectories (round-4 verdict item #1).
"""

from __future__ import annotations

import math

import numpy as np
import torch


def to_ragged(batch) -> dict:
    """Padded static batch (cls (B,G), bboxes (B,G,4), mask (B,G)) ->
    reference ragged collate dict {batch_idx, cls (n,1), bboxes (n,4)}."""
    m = np.asarray(batch["mask"]) > 0
    bi, gi = np.nonzero(m)
    return {
        "batch_idx": torch.from_numpy(bi.astype(np.float32)),
        "cls": torch.from_numpy(np.asarray(batch["cls"])[bi, gi, None].astype(np.float32)),
        "bboxes": torch.from_numpy(np.asarray(batch["bboxes"])[bi, gi].astype(np.float32)),
    }


class RefEMA:
    """ModelEMA (reference utils/torch_utils.py:502): decayed EMA over all
    floating-point state_dict entries, decay ramped by update count."""

    def __init__(self, model, decay=0.9999, tau=2000.0):
        import copy

        self.ema = copy.deepcopy(model).eval()
        for p in self.ema.parameters():
            p.requires_grad_(False)
        self.updates = 0
        self._d = lambda x: decay * (1 - math.exp(-x / tau))

    @torch.no_grad()
    def update(self, model):
        self.updates += 1
        d = self._d(self.updates)
        msd = model.state_dict()
        for k, v in self.ema.state_dict().items():
            if v.dtype.is_floating_point:
                v *= d
                v += (1 - d) * msd[k].detach()


def build_ref_optimizer(model, lr0: float, momentum: float, weight_decay: float):
    """Reference build_optimizer (trainer.py:758): param_groups =
    [biases(no decay), weights(decay), norm-weights(no decay)]."""
    bn = tuple(v for k, v in torch.nn.__dict__.items() if "Norm" in k)
    g = ([], [], [])
    for module_name, module in model.named_modules():
        for param_name, param in module.named_parameters(recurse=False):
            fullname = f"{module_name}.{param_name}" if module_name else param_name
            if "bias" in fullname:
                g[2].append(param)
            elif isinstance(module, bn):
                g[1].append(param)
            else:
                g[0].append(param)
    opt = torch.optim.SGD(g[2], lr=lr0, momentum=momentum, nesterov=True)
    opt.add_param_group({"params": g[0], "weight_decay": weight_decay})
    opt.add_param_group({"params": g[1], "weight_decay": 0.0})
    return opt


class RefTrainer:
    """The reference _do_train hot loop (trainer.py:318-404) without the
    DDP/AMP/logging shell: warmup interp, accumulate, clip, step, EMA."""

    def __init__(self, ref_model, loss_obj, epochs: int, nb: int, batch_size: int,
                 lr0=0.01, lrf=0.01, momentum=0.937, weight_decay=0.0005,
                 warmup_epochs=3.0, warmup_momentum=0.8, warmup_bias_lr=0.1,
                 nbs=64, to_batch=None):
        self.model = ref_model
        self.loss = loss_obj
        # padded-batch -> reference ragged dict converter; tasks override it
        # (segment adds masks, OBB ships 5-param rboxes)
        self.to_batch = to_batch or to_ragged
        self.epochs, self.nb, self.batch_size, self.nbs = epochs, nb, batch_size, nbs
        self.accumulate = max(round(nbs / batch_size), 1)
        wd = weight_decay * batch_size * self.accumulate / nbs  # trainer.py:300
        self.optimizer = build_ref_optimizer(ref_model, lr0, momentum, wd)
        self.lr0, self.lrf = lr0, lrf
        self.momentum, self.warmup_momentum = momentum, warmup_momentum
        self.warmup_bias_lr = warmup_bias_lr
        self.nw = max(round(warmup_epochs * nb), 100) if warmup_epochs > 0 else -1
        self.lf = lambda x: (1 - x / epochs) * (1.0 - lrf) + lrf  # trainer.py:209
        self.ema = RefEMA(ref_model)
        self.last_opt_step = -1

    def train_epoch(self, epoch: int, batches) -> float:
        self.model.train()
        total = 0.0
        for i, batch in enumerate(batches):
            ni = i + self.nb * epoch
            if ni <= self.nw:  # warmup interp (trainer.py:355-367)
                xi = [0, self.nw]
                self.accumulate = max(
                    1, round(float(np.interp(ni, xi, [1, self.nbs / self.batch_size])))
                )
                for j, x in enumerate(self.optimizer.param_groups):
                    x["lr"] = float(np.interp(
                        ni, xi,
                        [self.warmup_bias_lr if j == 0 else 0.0, self.lr0 * self.lf(epoch)],
                    ))
                    if "momentum" in x:
                        x["momentum"] = float(
                            np.interp(ni, xi, [self.warmup_momentum, self.momentum])
                        )
            else:  # scheduler regime: lr0 * lf(epoch) for every group
                for x in self.optimizer.param_groups:
                    x["lr"] = self.lr0 * self.lf(epoch)
                    if "momentum" in x:
                        x["momentum"] = self.momentum
            im_np = np.asarray(batch["img"])
            imgs = torch.from_numpy(
                np.ascontiguousarray(im_np.transpose(0, 3, 1, 2))
            ).float()
            if im_np.dtype == np.uint8:  # loader now ships uint8; reference preprocess_batch /255
                imgs = imgs / 255.0
            preds = self.model(imgs)
            loss, _items = self.loss(preds, self.to_batch(batch))
            total += float(loss.detach()) / self.batch_size
            loss.backward()
            if ni - self.last_opt_step >= self.accumulate:  # trainer.py:390
                torch.nn.utils.clip_grad_norm_(self.model.parameters(), max_norm=10.0)
                self.optimizer.step()
                self.optimizer.zero_grad()
                self.ema.update(self.model)
                self.last_opt_step = ni
        return total / max(self.nb, 1)

    def ema_state_numpy(self) -> dict:
        return {k: v.detach().numpy() for k, v in self.ema.ema.state_dict().items()}
