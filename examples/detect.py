"""Folder prediction (reference root detect.py:15-18)."""

from bsyolo_tpu import YOLO

if __name__ == "__main__":
    model = YOLO("runs/detect/bs-yolo/weights/best.ckpt")
    results = model.predict("datasets/car/images/test", conf=0.25, save=True, verbose=True)
    print(f"{len(results)} images processed")
