"""Validate a trained checkpoint (reference root val.py:6-7)."""

from bsyolo_tpu import YOLO

if __name__ == "__main__":
    model = YOLO("runs/detect/bs-yolo/weights/last.ckpt")
    metrics = model.val(data="car.yaml", batch=64)
    print(metrics.results_dict)
