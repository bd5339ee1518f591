"""Train BS-YOLO on the 12-class vehicle dataset.

Equivalent of the reference root train.py (train.py:7-21): yolo11 graph on
car.yaml, SGD, 200 epochs, close_mosaic for the final 20.
"""

from bsyolo_tpu import YOLO

if __name__ == "__main__":
    model = YOLO("yolo11n.yaml")  # the BS graph (C3k2_gai/SCDown/MSCA/ELA)
    model.train(
        data="car.yaml",
        epochs=200,
        imgsz=640,
        batch=16,  # batch=-1 auto-sizes from the compiler memory model
        optimizer="SGD",
        close_mosaic=20,
        project="runs/detect",
        name="bs-yolo",
    )
