"""Runnable offline open-vocabulary (YOLO-World) demo.

The reference's world path binds class-name text embeddings (CLIP ViT-B/32)
into C2fAttn/ImagePoolingAttn/contrastive heads. CLIP is absent offline, so
this demo uses the bundled deterministic hashed n-gram embedder
(bsyolo_tpu/utils/text_embed.py) — lexical stand-in vectors that drive the
identical compute path. Swap `embeddings=` with CLIP outputs for real
semantics.

    JAX_PLATFORMS=cpu python examples/world_demo.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    from bsyolo_tpu import YOLOWorld
    from bsyolo_tpu.utils.text_embed import hashed_text_embeddings

    classes = ["person", "bus", "fire hydrant"]
    m = YOLOWorld("yolov8-world.yaml")
    # identical to m.set_classes(classes) — shown explicitly so the CLIP
    # substitution point is obvious:
    m.set_classes(classes, embeddings=hashed_text_embeddings(classes))

    img = np.random.default_rng(0).integers(0, 255, (480, 640, 3), np.uint8)
    results = m.predict(img, conf=0.25, imgsz=320)
    r = results[0]
    n = 0 if r.boxes is None else len(r.boxes)
    print(f"classes={classes}")
    print(f"detections: {n} (untrained weights on noise -> expect 0)")
    print(f"speed: {r.speed}")


def train(data_yaml: str, epochs: int = 10):
    """Fine-tune the world graph on a close-set dataset (WorldTrainer analog,
    reference models/yolo/world/train.py):

        JAX_PLATFORMS=cpu python examples/world_demo.py train car.yaml 10

    Text embeddings come from the hashed fallback unless you pass CLIP
    vectors via YOLOWorld.train(text_embeddings=...). Grounding-caption
    json trains the same way after data/converter.convert_grounding."""
    from bsyolo_tpu import YOLOWorld

    m = YOLOWorld("yolov8s-worldv2.yaml")
    metrics = m.train(data=data_yaml, epochs=epochs)
    print(f"mAP50 {metrics.box.map50:.4f}; trained text {m.txt_feats.shape}")
    return m


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "train":
        train(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 10)
    else:
        main()
