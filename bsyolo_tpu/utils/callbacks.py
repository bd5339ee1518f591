"""Callback event bus (reference utils/callbacks/base.py:144-217).

Same hook-point names as the reference so user callbacks port unchanged.
Integrations (TensorBoard/W&B/...) register themselves when their packages
are importable, mirroring add_integration_callbacks.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Callable, Dict, List

HOOKS = [
    # trainer
    "on_pretrain_routine_start",
    "on_pretrain_routine_end",
    "on_train_start",
    "on_train_epoch_start",
    "on_train_batch_start",
    "optimizer_step",
    "on_before_zero_grad",
    "on_train_batch_end",
    "on_train_epoch_end",
    "on_fit_epoch_end",
    "on_model_save",
    "on_train_end",
    "on_params_update",
    "teardown",
    # validator
    "on_val_start",
    "on_val_batch_start",
    "on_val_batch_end",
    "on_val_end",
    # predictor
    "on_predict_start",
    "on_predict_batch_start",
    "on_predict_postprocess_end",
    "on_predict_batch_end",
    "on_predict_end",
    # exporter
    "on_export_start",
    "on_export_end",
]


class CallbackRegistry:
    def __init__(self):
        self._cbs: Dict[str, List[Callable]] = defaultdict(list)

    def add(self, event: str, fn: Callable):
        if event not in HOOKS:
            raise KeyError(f"unknown callback event '{event}' (valid: {HOOKS})")
        self._cbs[event].append(fn)

    def run(self, event: str, obj):
        for fn in self._cbs.get(event, []):
            fn(obj)

    def get(self, event: str):
        return list(self._cbs.get(event, []))


def default_callbacks() -> CallbackRegistry:
    reg = CallbackRegistry()
    try:  # TensorBoard integration, enabled when installed (reference callbacks/tensorboard.py)
        from torch.utils.tensorboard import SummaryWriter  # noqa: F401

        _add_tensorboard(reg)
    except Exception:
        pass
    # the other sinks (W&B/MLflow/Comet/ClearML/DVC/Neptune/RayTune + JSONL),
    # each self-gated on its package (reference add_integration_callbacks)
    from bsyolo_tpu.utils.loggers import add_integration_callbacks

    add_integration_callbacks(reg)
    return reg


def _add_tensorboard(reg: CallbackRegistry):
    state = {}

    def on_train_start(trainer):
        from torch.utils.tensorboard import SummaryWriter

        state["writer"] = SummaryWriter(str(trainer.save_dir))

    def on_fit_epoch_end(trainer):
        w = state.get("writer")
        if w is None:
            return
        for k, v in (trainer.epoch_metrics or {}).items():
            w.add_scalar(k, v, trainer.epoch)

    def on_train_end(trainer):
        w = state.pop("writer", None)
        if w is not None:
            w.close()

    reg.add("on_train_start", on_train_start)
    reg.add("on_fit_epoch_end", on_fit_epoch_end)
    reg.add("on_train_end", on_train_end)


class EarlyStopping:
    """Stop after `patience` epochs without fitness improvement
    (reference utils/torch_utils.py:720)."""

    def __init__(self, patience: int = 100):
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or float("inf")

    def __call__(self, epoch: int, fitness: float) -> bool:
        if fitness is None:
            return False
        if fitness >= self.best_fitness:
            self.best_epoch = epoch
            self.best_fitness = fitness
        return (epoch - self.best_epoch) >= self.patience
