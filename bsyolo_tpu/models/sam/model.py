"""SAM facade (reference models/sam/model.py SAM).

    from bsyolo_tpu.models import SAM

    sam = SAM("sam_b.pt")            # or "mobile_sam.pt"; builds fresh
                                     # weights if the checkpoint is absent
    r = sam("img.jpg", bboxes=[[100, 100, 300, 300]])
    r = sam("img.jpg", points=[[250, 250]], labels=[1])
    everything = sam("img.jpg")      # AMG over a point grid
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


class SAM:
    """Promptable segmentation facade over the SAM family."""

    def __init__(self, model: str = "sam_b.pt", img_size: int = 1024):
        from bsyolo_tpu.models.sam.build import build_sam

        self.model_path = str(model)
        self.task = "segment"
        self.model, self.variables = build_sam(self.model_path, img_size=img_size)
        self._predictor = None
        self._img_size = img_size

    @property
    def predictor(self):
        from bsyolo_tpu.models.sam.predict import SAMPredictor
        from bsyolo_tpu.models.sam.sam2 import SAM2Model, SAM2Predictor

        if self._predictor is None:
            cls = SAM2Predictor if isinstance(self.model, SAM2Model) else SAMPredictor
            self._predictor = cls(self.model, self.variables, self._img_size)
        return self._predictor

    def __call__(self, source, bboxes=None, points=None, labels=None, **kwargs):
        return self.predict(source, bboxes=bboxes, points=points, labels=labels, **kwargs)

    def predict(self, source, bboxes=None, points=None, labels=None,
                multimask_output: bool = False, **kwargs):
        """Run prompted (or everything-mode when no prompts) segmentation."""
        imgs = self._load(source)
        results = []
        for img in imgs:
            p = self.predictor.set_image(img)
            if bboxes is None and points is None:
                results.append(p.generate(**kwargs))
            else:
                results.append(p(points=points, labels=labels, bboxes=bboxes,
                                 multimask_output=multimask_output))
        return results

    @staticmethod
    def _load(source):
        import cv2

        if isinstance(source, np.ndarray):
            return [source]
        if isinstance(source, (list, tuple)):
            out = []
            for s in source:
                out.extend(SAM._load(s))
            return out
        img = cv2.imread(str(source))
        if img is None:
            raise FileNotFoundError(f"cannot read image: {source}")
        return [img[..., ::-1]]

    def info(self):
        from bsyolo_tpu.nn.model import count_params

        n = count_params(self.variables["params"])
        print(f"SAM {self.model_path}: {n:,} params, img_size {self._img_size}")
        return {"params": n}
