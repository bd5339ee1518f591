"""Hyperparameter evolution (reference engine/tuner.py usage)."""

from bsyolo_tpu.engine.tuner import Tuner

if __name__ == "__main__":
    tuner = Tuner({"model": "yolo11n.yaml", "data": "car.yaml", "epochs": 30})
    best = tuner(iterations=20)
    print(best)
