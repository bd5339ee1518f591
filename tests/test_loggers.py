"""Logger integrations: gating, JSONL sink, and a mocked-wandb end-to-end."""

import json
import sys
import types
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))


def _fake_trainer(tmp_path, epoch=0, metrics=None):
    t = SimpleNamespace()
    t.save_dir = tmp_path
    t.epoch = epoch
    t.epoch_metrics = metrics or {"loss": 1.5, "metrics/mAP50(B)": 0.4}
    t.args = SimpleNamespace(lr0=0.01, epochs=3)
    return t


class TestIntegrations:
    def test_gating_reports_available_only(self):
        from bsyolo_tpu.utils.callbacks import CallbackRegistry
        from bsyolo_tpu.utils.loggers import add_integration_callbacks

        reg = CallbackRegistry()
        enabled = add_integration_callbacks(reg)
        assert "jsonl" in enabled  # dependency-free sink always on
        assert "wandb" not in enabled  # not installed in this image

    def test_jsonl_sink_writes_rows(self, tmp_path):
        from bsyolo_tpu.utils.callbacks import CallbackRegistry
        from bsyolo_tpu.utils.loggers import add_integration_callbacks

        reg = CallbackRegistry()
        add_integration_callbacks(reg)
        for e in range(3):
            reg.run("on_fit_epoch_end", _fake_trainer(tmp_path, epoch=e))
        rows = [json.loads(l) for l in (tmp_path / "results.jsonl").read_text().splitlines()]
        assert [r["epoch"] for r in rows] == [0, 1, 2]
        assert rows[0]["loss"] == 1.5

    def test_mocked_wandb_full_lifecycle(self, tmp_path, monkeypatch):
        calls = []

        class FakeRun:
            id = "abc"

            def log_artifact(self, art, aliases=None):
                calls.append(("artifact", aliases))

            def finish(self):
                calls.append(("finish",))

        fake = types.ModuleType("wandb")
        fake.init = lambda **kw: calls.append(("init", kw)) or FakeRun()
        fake.log = lambda m, step=None: calls.append(("log", step, dict(m)))
        fake.Artifact = lambda name, type: SimpleNamespace(add_file=lambda p: None)
        monkeypatch.setitem(sys.modules, "wandb", fake)

        from bsyolo_tpu.utils.callbacks import CallbackRegistry
        from bsyolo_tpu.utils.loggers import _add_wandb

        reg = CallbackRegistry()
        assert _add_wandb(reg)
        t = _fake_trainer(tmp_path)
        reg.run("on_pretrain_routine_start", t)
        reg.run("on_fit_epoch_end", t)
        (tmp_path / "weights").mkdir()
        (tmp_path / "weights" / "best.ckpt").write_bytes(b"x")
        reg.run("on_train_end", t)
        kinds = [c[0] for c in calls]
        assert kinds == ["init", "log", "artifact", "finish"]
        assert calls[1][2]["loss"] == 1.5

    def test_trainer_default_bus_includes_jsonl(self):
        from bsyolo_tpu.utils.callbacks import default_callbacks

        reg = default_callbacks()
        assert len(reg.get("on_fit_epoch_end")) >= 2  # tensorboard + jsonl
