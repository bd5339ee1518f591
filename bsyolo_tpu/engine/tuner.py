"""Hyperparameter tuner (reference engine/tuner.py:33-241).

Mutation-based evolution: repeatedly mutate the best-so-far hyperparameters
within bounded search spaces (gaussian noise, gain-clipped), run a short
train, and keep the fittest. Results land in tune_dir/tune_results.csv and
best_hyperparameters.yaml like the reference.
"""

from __future__ import annotations

import csv
import shutil
from pathlib import Path
from typing import Dict, Optional

import numpy as np
import yaml

from bsyolo_tpu.utils import LOGGER

# (min, max, gain) per mutable key (reference tuner.py:80-110 space)
DEFAULT_SPACE = {
    "lr0": (1e-5, 1e-1, 1.0),
    "lrf": (0.0001, 0.1, 1.0),
    "momentum": (0.7, 0.98, 0.3),
    "weight_decay": (0.0, 0.001, 1.0),
    "warmup_epochs": (0.0, 5.0, 1.0),
    "warmup_momentum": (0.0, 0.95, 1.0),
    "box": (1.0, 20.0, 1.0),
    "cls": (0.2, 4.0, 1.0),
    "dfl": (0.4, 6.0, 1.0),
    "hsv_h": (0.0, 0.1, 1.0),
    "hsv_s": (0.0, 0.9, 1.0),
    "hsv_v": (0.0, 0.9, 1.0),
    "degrees": (0.0, 45.0, 1.0),
    "translate": (0.0, 0.9, 1.0),
    "scale": (0.0, 0.95, 1.0),
    "shear": (0.0, 10.0, 1.0),
    "perspective": (0.0, 0.001, 1.0),
    "flipud": (0.0, 1.0, 1.0),
    "fliplr": (0.0, 1.0, 1.0),
    "mosaic": (0.0, 1.0, 1.0),
    "mixup": (0.0, 1.0, 1.0),
    "iou_ratio": (0.1, 0.9, 1.0),
}


class Tuner:
    def __init__(self, overrides: Dict, space: Optional[Dict] = None, tune_dir: str = "runs/tune"):
        from bsyolo_tpu.cfg import get_cfg

        self.base = dict(overrides)
        self.space = space or DEFAULT_SPACE
        self.tune_dir = Path(tune_dir)
        self.args = get_cfg(overrides={k: v for k, v in overrides.items() if k not in ("model", "data")})
        self.csv = self.tune_dir / "tune_results.csv"
        self.rng = np.random.default_rng(self.args.seed)

    def _mutate(self, parent: Dict, mutation: float = 0.8, sigma: float = 0.2) -> Dict:
        """Gaussian mutation within bounds (reference tuner.py:112-160)."""
        hyp = dict(parent)
        while True:
            changed = False
            for k, (lo, hi, gain) in self.space.items():
                if self.rng.random() < mutation:
                    factor = 1.0 + self.rng.normal(0, sigma) * gain
                    hyp[k] = float(np.clip(parent.get(k, (lo + hi) / 2) * factor, lo, hi))
                    changed = changed or hyp[k] != parent.get(k)
            if changed or not self.space:
                return hyp

    def __call__(self, iterations: int = 10) -> Dict:
        from bsyolo_tpu.engine.trainer import DetectionTrainer

        self.tune_dir.mkdir(parents=True, exist_ok=True)
        best_fitness = -1.0
        best_hyp: Dict = {}
        parent = {k: getattr(self.args, k) for k in self.space if hasattr(self.args, k)}
        rows = []
        for it in range(iterations):
            hyp = self._mutate(parent if not best_hyp else best_hyp) if it else dict(parent)
            overrides = {**self.base, **hyp, "project": str(self.tune_dir), "name": f"iter{it}"}
            overrides.setdefault("plots", False)
            try:
                trainer = DetectionTrainer(overrides=overrides)
                metrics = trainer.train()
                fitness = metrics.fitness if metrics else 0.0
            except Exception as e:  # a bad mutation must not kill the sweep
                LOGGER.warning(f"tune iter {it} failed: {e}")
                fitness = 0.0
            rows.append({"iteration": it, "fitness": fitness, **hyp})
            if fitness > best_fitness:
                best_fitness = fitness
                best_hyp = dict(hyp)
            LOGGER.info(f"tune iter {it}: fitness {fitness:.4f} (best {best_fitness:.4f})")

        with open(self.csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        (self.tune_dir / "best_hyperparameters.yaml").write_text(yaml.safe_dump(best_hyp))
        LOGGER.info(f"tuning done: best fitness {best_fitness:.4f} -> {self.tune_dir}")
        return best_hyp
