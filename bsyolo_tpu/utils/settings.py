"""Persisted user settings (reference utils/__init__.py SettingsManager).

JSON file at ~/.config/bsyolo_tpu/settings.json holding user-scoped paths
and toggles; dict-like access, version-migrated, reset()able — the same
contract as the reference's SettingsManager minus the telemetry keys.
"""

from __future__ import annotations

import json
import uuid
from pathlib import Path
from typing import Any, Dict

SETTINGS_VERSION = "0.1.0"


def _defaults(root: Path) -> Dict[str, Any]:
    return {
        "settings_version": SETTINGS_VERSION,
        "uuid": uuid.uuid4().hex,
        "datasets_dir": str(root / "datasets"),
        "weights_dir": str(root / "weights"),
        "runs_dir": str(root / "runs"),
        "tensorboard": True,
        "jsonl": True,
        "sync": False,  # no telemetry in this build
        # persistent XLA compilation cache: repeat predict/train processes
        # skip the 25-60s first-compile; "" disables
        "compilation_cache_dir": str(root.parent / "bsyolo_tpu" / "jax_cache"),
    }


def enable_compilation_cache(settings=None) -> str:
    """Point jax at the persistent compilation cache (idempotent; respects an
    explicit JAX_COMPILATION_CACHE_DIR env or jax.config already set)."""
    import os

    import jax

    if jax.config.jax_compilation_cache_dir:  # already configured (tests, env)
        return jax.config.jax_compilation_cache_dir
    d = os.environ.get("JAX_COMPILATION_CACHE_DIR") or (
        (settings or SettingsManager()).get("compilation_cache_dir") or ""
    )
    if not d:
        return ""
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return d


class SettingsManager(dict):
    """Dict-backed settings persisted to disk on every update."""

    def __init__(self, file: str = None):
        super().__init__()
        file = Path(file or Path.home() / ".config" / "bsyolo_tpu" / "settings.json")
        root = file.parent.parent / "bsyolo_tpu_data"
        self._defaults = _defaults(root)
        dict.update(self, self._defaults)  # no save: self.file not set yet
        self.file = file
        if self.file.exists():
            try:
                stored = json.loads(self.file.read_text())
                if stored.get("settings_version") == SETTINGS_VERSION:
                    self.update(stored)
                else:  # version migration: keep known keys, refresh the rest
                    self.update({k: v for k, v in stored.items() if k in self._defaults
                                 and k != "settings_version"})
                    self.save()
            except Exception:
                self.reset()
        else:
            self.save()

    def save(self):
        self.file.parent.mkdir(parents=True, exist_ok=True)
        self.file.write_text(json.dumps(dict(self), indent=2))

    def update(self, *args, **kwargs):
        super().update(*args, **kwargs)
        if hasattr(self, "file"):
            self.save()

    def __setitem__(self, key, value):
        super().__setitem__(key, value)
        self.save()

    def reset(self):
        self.clear()
        dict.update(self, self._defaults)
        self.save()
