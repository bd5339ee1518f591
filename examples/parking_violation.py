"""Blind-sidewalk illegal-parking detection (reference sys/videobytetrack.py).

Offline: build the background tactile-paving mask. Online: track vehicles,
check occlusion >= 70%, flag dwell violations after 10 s.
"""

from bsyolo_tpu import YOLO
from bsyolo_tpu.app import BlindwaySegmenter, ParkingViolationPipeline

if __name__ == "__main__":
    detector = YOLO("runs/detect/bs-yolo/weights/best.ckpt")
    segmenter = BlindwaySegmenter(base_c=32)  # load trained GRFB-UNet weights here
    pipe = ParkingViolationPipeline(
        detector, segmenter, occlusion_threshold=0.7, dwell_seconds=10.0,
        tracker="bytetrack.yaml",
    )
    pipe.prepare_background("background/static_background.jpg")  # or a video
    events = pipe.run("street.mp4", output_dir="results")
    n_viol = sum(1 for e in events if e["violations"])
    print(f"{len(events)} frames, {n_viol} with violations -> results/")
