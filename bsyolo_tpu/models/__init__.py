"""Model families beyond the YOLO graph zoo (reference ultralytics/models/).

- SAM / MobileSAM — promptable segmentation (models/sam/)
- FastSAM — YOLO-seg-based segment-anything with prompt selection
- RTDETR — facade re-export (lives in bsyolo_tpu.model with YOLO)
"""


def __getattr__(name):  # lazy to keep imports cheap
    if name == "SAM":
        from bsyolo_tpu.models.sam import SAM

        return SAM
    if name == "FastSAM":
        from bsyolo_tpu.models.fastsam import FastSAM

        return FastSAM
    if name == "RTDETR":
        from bsyolo_tpu.model import RTDETR

        return RTDETR
    if name == "NAS":
        from bsyolo_tpu.models.nas import NAS

        return NAS
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["SAM", "FastSAM", "RTDETR", "NAS"]
