"""Tiled large-image inference (reference detect-sahi.py:3-12, TPU-native:
tiles are a sharded mesh axis instead of a serial host loop)."""

import cv2

from bsyolo_tpu import YOLO
from bsyolo_tpu.engine.tiled import predict_tiled
from bsyolo_tpu.parallel import make_mesh

if __name__ == "__main__":
    model = YOLO("runs/detect/bs-yolo/weights/best.ckpt")
    image = cv2.imread("big_scene.jpg")
    dets = predict_tiled(
        model.model, model.spec, model.variables, image,
        tile=800, overlap=0.0,  # the reference's SAHI settings
        mesh=make_mesh(),
    )
    for x1, y1, x2, y2, conf, cls in dets:
        print(f"{model.names[int(cls)]}: {conf:.2f} @ ({x1:.0f},{y1:.0f},{x2:.0f},{y2:.0f})")
