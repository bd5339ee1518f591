"""Global motion compensation for BoT-SORT (reference trackers/utils/gmc.py).

Sparse-optical-flow variant (the reference default, gmc.py sparseOptFlow):
track corners between downscaled consecutive frames with Lucas-Kanade and
estimate a partial affine warp; the tracker applies the warp to predicted
track means before association.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class GMC:
    def __init__(self, method: str = "sparseOptFlow", downscale: int = 2):
        self.method = method
        self.downscale = max(1, downscale)
        self.prev_gray: Optional[np.ndarray] = None
        self.prev_pts = None

    def apply(self, frame: np.ndarray, detections=None) -> np.ndarray:
        """Returns a 2x3 affine warp from the previous frame to this one."""
        import cv2

        H = np.eye(2, 3, dtype=np.float32)
        if self.method in (None, "none", "None"):
            return H
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        if self.downscale > 1:
            gray = cv2.resize(gray, (gray.shape[1] // self.downscale, gray.shape[0] // self.downscale))

        pts = cv2.goodFeaturesToTrack(
            gray, maxCorners=1000, qualityLevel=0.01, minDistance=1, blockSize=3,
            useHarrisDetector=False, k=0.04,
        )
        if self.prev_gray is None or self.prev_pts is None or pts is None:
            self.prev_gray = gray
            self.prev_pts = pts
            return H

        nxt, status, _ = cv2.calcOpticalFlowPyrLK(self.prev_gray, gray, self.prev_pts, None)
        if nxt is not None and status is not None:
            ok = status.flatten() == 1
            p0 = self.prev_pts[ok].reshape(-1, 2)
            p1 = nxt[ok].reshape(-1, 2)
            if len(p0) >= 4:
                M, _ = cv2.estimateAffinePartial2D(p0, p1, method=cv2.RANSAC)
                if M is not None:
                    H = M.astype(np.float32)
                    if self.downscale > 1:  # rescale translation back to full res
                        H[0, 2] *= self.downscale
                        H[1, 2] *= self.downscale
        self.prev_gray = gray
        self.prev_pts = pts
        return H

    @staticmethod
    def warp_track_means(tracks, H: np.ndarray):
        """Apply the warp to XYAH track means (reference STrack.multi_gmc)."""
        if len(tracks) == 0:
            return
        R = H[:2, :2]
        t = H[:2, 2]
        for tr in tracks:
            if tr.mean is None:
                continue
            xy = R @ tr.mean[:2] + t
            tr.mean[0], tr.mean[1] = float(xy[0]), float(xy[1])
