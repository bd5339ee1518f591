"""Logger integrations (reference utils/callbacks/{wb,mlflow,comet,clearml,
dvc,neptune,raytune}.py + add_integration_callbacks, base.py:219).

Each integration registers on the callback bus only when its package
imports, exactly like the reference. All of them follow the same shape:
start a run on train start, stream epoch metrics on fit-epoch end, upload
the best checkpoint and close on train end. A JSONL sink (no dependency) is
always available as the machine-readable analog of results.csv.
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from bsyolo_tpu.utils.callbacks import CallbackRegistry


def add_integration_callbacks(reg: "CallbackRegistry") -> list:
    """Attach every available integration; returns the enabled names."""
    enabled = []
    for name, fn in (
        ("jsonl", _add_jsonl),
        ("wandb", _add_wandb),
        ("mlflow", _add_mlflow),
        ("comet", _add_comet),
        ("clearml", _add_clearml),
        ("dvc", _add_dvc),
        ("neptune", _add_neptune),
        ("raytune", _add_raytune),
    ):
        try:
            if fn(reg):
                enabled.append(name)
        except Exception:  # a broken integration must never break training
            pass
    return enabled


def _metrics(trainer) -> dict:
    m = dict(trainer.epoch_metrics or {})
    m = {k: float(v) for k, v in m.items() if isinstance(v, (int, float))}
    return m


def _add_jsonl(reg) -> bool:
    """Always-on JSONL metrics stream: results.jsonl next to results.csv."""

    def on_fit_epoch_end(trainer):
        row = {"epoch": trainer.epoch, **_metrics(trainer)}
        with open(trainer.save_dir / "results.jsonl", "a") as f:
            f.write(json.dumps(row) + "\n")

    reg.add("on_fit_epoch_end", on_fit_epoch_end)
    return True


def _add_wandb(reg) -> bool:
    """Weights & Biases (reference callbacks/wb.py)."""
    import wandb  # noqa: F401

    state = {}

    def on_pretrain_routine_start(trainer):
        import wandb

        state["run"] = wandb.init(
            project=str(trainer.save_dir.parent.name or "bsyolo_tpu"),
            name=trainer.save_dir.name,
            config=vars(trainer.args),
        )

    def on_fit_epoch_end(trainer):
        import wandb

        if state.get("run"):
            wandb.log(_metrics(trainer), step=trainer.epoch)

    def on_train_end(trainer):
        import wandb

        run = state.pop("run", None)
        if run:
            best = trainer.save_dir / "weights" / "best.ckpt"
            if best.exists():
                art = wandb.Artifact(f"run_{run.id}_model", type="model")
                art.add_file(str(best))
                run.log_artifact(art, aliases=["best"])
            run.finish()

    reg.add("on_pretrain_routine_start", on_pretrain_routine_start)
    reg.add("on_fit_epoch_end", on_fit_epoch_end)
    reg.add("on_train_end", on_train_end)
    return True


def _add_mlflow(reg) -> bool:
    """MLflow (reference callbacks/mlflow.py)."""
    import mlflow  # noqa: F401

    def on_pretrain_routine_end(trainer):
        import mlflow

        mlflow.set_experiment(str(trainer.save_dir.parent.name or "bsyolo_tpu"))
        mlflow.start_run(run_name=trainer.save_dir.name)
        mlflow.log_params({k: str(v) for k, v in vars(trainer.args).items()})

    def on_fit_epoch_end(trainer):
        import mlflow

        mlflow.log_metrics(
            {k.replace("(", "_").replace(")", "_"): v for k, v in _metrics(trainer).items()},
            step=trainer.epoch,
        )

    def on_train_end(trainer):
        import mlflow

        best = trainer.save_dir / "weights" / "best.ckpt"
        if best.exists():
            mlflow.log_artifact(str(best))
        mlflow.end_run()

    reg.add("on_pretrain_routine_end", on_pretrain_routine_end)
    reg.add("on_fit_epoch_end", on_fit_epoch_end)
    reg.add("on_train_end", on_train_end)
    return True


def _add_comet(reg) -> bool:
    """Comet (reference callbacks/comet.py)."""
    import comet_ml  # noqa: F401

    state = {}

    def on_pretrain_routine_start(trainer):
        import comet_ml

        state["exp"] = comet_ml.Experiment(project_name="bsyolo_tpu")
        state["exp"].log_parameters(vars(trainer.args))

    def on_fit_epoch_end(trainer):
        exp = state.get("exp")
        if exp:
            exp.log_metrics(_metrics(trainer), step=trainer.epoch)

    def on_train_end(trainer):
        exp = state.pop("exp", None)
        if exp:
            best = trainer.save_dir / "weights" / "best.ckpt"
            if best.exists():
                exp.log_model("best", str(best))
            exp.end()

    reg.add("on_pretrain_routine_start", on_pretrain_routine_start)
    reg.add("on_fit_epoch_end", on_fit_epoch_end)
    reg.add("on_train_end", on_train_end)
    return True


def _add_clearml(reg) -> bool:
    """ClearML (reference callbacks/clearml.py)."""
    import clearml  # noqa: F401

    state = {}

    def on_pretrain_routine_start(trainer):
        from clearml import Task

        state["task"] = Task.init(project_name="bsyolo_tpu", task_name=trainer.save_dir.name)
        state["task"].connect(vars(trainer.args))

    def on_fit_epoch_end(trainer):
        task = state.get("task")
        if task:
            for k, v in _metrics(trainer).items():
                task.get_logger().report_scalar("train", k, v, trainer.epoch)

    def on_train_end(trainer):
        task = state.pop("task", None)
        if task:
            best = trainer.save_dir / "weights" / "best.ckpt"
            if best.exists():
                task.update_output_model(model_path=str(best), model_name="best")
            task.close()

    reg.add("on_pretrain_routine_start", on_pretrain_routine_start)
    reg.add("on_fit_epoch_end", on_fit_epoch_end)
    reg.add("on_train_end", on_train_end)
    return True


def _add_dvc(reg) -> bool:
    """DVCLive (reference callbacks/dvc.py)."""
    import dvclive  # noqa: F401

    state = {}

    def on_pretrain_routine_start(trainer):
        from dvclive import Live

        state["live"] = Live(str(trainer.save_dir / "dvc"), save_dvc_exp=True)

    def on_fit_epoch_end(trainer):
        live = state.get("live")
        if live:
            for k, v in _metrics(trainer).items():
                live.log_metric(k, v)
            live.next_step()

    def on_train_end(trainer):
        live = state.pop("live", None)
        if live:
            live.end()

    reg.add("on_pretrain_routine_start", on_pretrain_routine_start)
    reg.add("on_fit_epoch_end", on_fit_epoch_end)
    reg.add("on_train_end", on_train_end)
    return True


def _add_neptune(reg) -> bool:
    """NeptuneAI (reference callbacks/neptune.py)."""
    import neptune  # noqa: F401

    state = {}

    def on_pretrain_routine_start(trainer):
        import neptune

        state["run"] = neptune.init_run(name=trainer.save_dir.name)
        state["run"]["configuration/hyperparameters"] = {
            k: str(v) for k, v in vars(trainer.args).items()
        }

    def on_fit_epoch_end(trainer):
        run = state.get("run")
        if run:
            for k, v in _metrics(trainer).items():
                run[f"train/{k}"].append(v, step=trainer.epoch)

    def on_train_end(trainer):
        run = state.pop("run", None)
        if run:
            run.stop()

    reg.add("on_pretrain_routine_start", on_pretrain_routine_start)
    reg.add("on_fit_epoch_end", on_fit_epoch_end)
    reg.add("on_train_end", on_train_end)
    return True


def _add_raytune(reg) -> bool:
    """Ray Tune session reporting (reference callbacks/raytune.py)."""
    import ray  # noqa: F401
    from ray import tune  # noqa: F401

    def on_fit_epoch_end(trainer):
        from ray import train as ray_train
        from ray.train import session

        if session._get_session():  # inside a tune run
            ray_train.report({**_metrics(trainer), "epoch": trainer.epoch})

    reg.add("on_fit_epoch_end", on_fit_epoch_end)
    return True
