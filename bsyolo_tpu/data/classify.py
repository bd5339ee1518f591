"""Classification dataset: folder-per-class layout (reference data/dataset.py
ClassificationDataset — torchvision ImageFolder semantics)."""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from bsyolo_tpu.data.dataset import IMG_FORMATS


class ClassificationDataset:
    def __init__(self, root: str, imgsz: int = 224, augment: bool = True, fliplr: float = 0.5,
                 auto_augment: Optional[str] = None, erasing: float = 0.0,
                 crop_fraction: float = 1.0):
        self.root = Path(root)
        classes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        if not classes:
            raise FileNotFoundError(f"no class folders under {root}")
        self.class_names: Dict[int, str] = dict(enumerate(classes))
        self.samples: List[Tuple[str, int]] = []
        for ci, cname in enumerate(classes):
            for f in sorted((self.root / cname).rglob("*")):
                if f.suffix.lower().lstrip(".") in IMG_FORMATS:
                    self.samples.append((str(f), ci))
        self.imgsz = imgsz
        self.augment = augment
        self.fliplr = fliplr
        self.auto_augment = auto_augment
        self.erasing = erasing
        self.crop_fraction = crop_fraction

    def __len__(self):
        return len(self.samples)

    def get_sample(self, i: int, rng: np.random.Generator):
        import cv2

        from bsyolo_tpu.data.photometric import classify_eval_transform, classify_train_transform

        path, cls = self.samples[i]
        im = cv2.imread(path)
        if im is None:
            raise FileNotFoundError(path)
        im = np.ascontiguousarray(im[..., ::-1])  # BGR->RGB
        if self.augment:
            # RandomResizedCrop + flips + RandAugment-or-HSV + erasing
            # (reference classify_augmentations, augment.py:2400)
            img = classify_train_transform(
                im, rng, size=self.imgsz, hflip=self.fliplr,
                auto_augment=self.auto_augment, erasing=self.erasing,
            )
        else:
            # shortest-edge resize + center crop (reference classify_transforms)
            img = classify_eval_transform(im, size=self.imgsz, crop_fraction=self.crop_fraction)
        return img, np.int32(cls)


class ClassifyLoader:
    def __init__(self, dataset: ClassificationDataset, batch_size: int, shuffle=True, seed=3, drop_last=True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0

    def set_epoch(self, e):
        self.epoch = e

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        n = len(self.dataset)
        rng = np.random.default_rng(self.seed + self.epoch * 1000003)
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        nb = len(self)
        for bi in range(nb):
            idxs = order[bi * self.batch_size : (bi + 1) * self.batch_size]
            if len(idxs) < self.batch_size and self.drop_last:
                idxs = np.concatenate([idxs, order[: self.batch_size - len(idxs)]])
            imgs, clss = zip(*(self.dataset.get_sample(int(i), rng) for i in idxs))
            yield {"img": np.stack(imgs), "cls": np.stack(clss)}
