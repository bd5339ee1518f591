"""BoT-SORT completion tests: XYWH Kalman golden parity, GMC methods,
ReID association, and a camera-pan trajectory regression."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from ref_oracle import _extract


def _ref_kalman(name):
    import scipy.linalg

    ns = _extract(
        "ultralytics/trackers/utils/kalman_filter.py",
        ("KalmanFilterXYAH", "KalmanFilterXYWH"),
    )
    ns["scipy"] = scipy
    return ns[name]()


class TestKalmanXYWHGolden:
    def test_full_cycle_matches_reference(self):
        from bsyolo_tpu.trackers.kalman import KalmanFilterXYWH

        ref, ours = _ref_kalman("KalmanFilterXYWH"), KalmanFilterXYWH()
        rng = np.random.default_rng(0)
        z0 = np.asarray([100.0, 50.0, 20.0, 40.0])
        rm, rc = ref.initiate(z0)
        om, oc = ours.initiate(z0)
        np.testing.assert_allclose(om, rm)
        np.testing.assert_allclose(oc, rc)
        for _ in range(5):
            rm, rc = ref.predict(rm, rc)
            om, oc = ours.predict(om, oc)
            z = z0 + rng.normal(0, 1, 4)
            rm, rc = ref.update(rm, rc, z)
            om, oc = ours.update(om, oc, z)
        np.testing.assert_allclose(om, rm, rtol=1e-10)
        np.testing.assert_allclose(oc, rc, rtol=1e-8)

    def test_multi_predict_matches_reference(self):
        from bsyolo_tpu.trackers.kalman import KalmanFilterXYWH

        ref, ours = _ref_kalman("KalmanFilterXYWH"), KalmanFilterXYWH()
        rng = np.random.default_rng(1)
        means = rng.uniform(10, 100, (6, 8))
        covs = np.stack([np.eye(8) * rng.uniform(0.5, 2) for _ in range(6)])
        rm, rc = ref.multi_predict(means.copy(), covs.copy())
        om, oc = ours.multi_predict(means.copy(), covs.copy())
        np.testing.assert_allclose(om, rm, rtol=1e-12)
        np.testing.assert_allclose(oc, rc, rtol=1e-12)


def _render(boxes, size=(240, 320), colors=None, pan=0):
    """Draw filled rectangles + a world-fixed texture grid; ``pan`` shifts
    the whole world left (camera moved right), so GMC can estimate it."""
    img = np.full(size + (3,), 30, np.uint8)
    # non-periodic world-fixed dot field (a periodic grid aliases large pans)
    world = np.random.default_rng(7)
    for _ in range(400):
        wy = int(world.uniform(0, size[0] - 3))
        wx = int(world.uniform(0, size[1] + 200))  # extra margin revealed by pans
        c = int(world.uniform(120, 255))  # drawn unconditionally: keeps the
        x = wx - pan  # RNG sequence (and so the world) identical across pans
        if 0 <= x < size[1] - 3:
            img[wy : wy + 3, x : x + 3] = c
    for i, (x1, y1, x2, y2) in enumerate(np.asarray(boxes, int)):
        c = colors[i] if colors is not None else (60 + 60 * i) % 255
        img[max(y1, 0) : y2, max(x1, 0) : x2] = c
    return img


class TestGMC:
    @pytest.mark.parametrize("method", ["sparseOptFlow", "orb", "sift", "ecc"])
    def test_recovers_translation(self, method):
        from bsyolo_tpu.trackers.gmc import GMC

        rng = np.random.default_rng(2)
        base = (rng.uniform(0, 1, (480, 640)) > 0.995).astype(np.uint8) * 255
        import cv2

        base = cv2.dilate(base, np.ones((3, 3), np.uint8))
        if method == "ecc":  # gradient-based: needs smooth intensity structure
            base = cv2.GaussianBlur(base, (21, 21), 8)
        base3 = np.stack([base] * 3, -1)
        dx = 12
        shifted = np.roll(base3, dx, axis=1)
        g = GMC(method=method, downscale=2)
        g.apply(base3)
        H = g.apply(shifted)
        assert H[0, 2] == pytest.approx(dx, abs=2.5), (method, H)
        assert H[1, 2] == pytest.approx(0, abs=2.5), (method, H)


class TestBotSortTracking:
    def _run(self, tracker, dets_per_frame, frames):
        ids_per_frame = []
        for dets, frame in zip(dets_per_frame, frames):
            xywh = np.asarray([[(b[0] + b[2]) / 2, (b[1] + b[3]) / 2, b[2] - b[0], b[3] - b[1]] for b in dets], np.float32)
            conf = np.full((len(dets),), 0.9, np.float32)
            cls = np.zeros((len(dets),), np.float32)
            out = tracker.update(xywh, conf, cls, img=frame)
            # map det row -> track id
            row = {int(r[-1]): int(r[4]) for r in out}
            ids_per_frame.append([row.get(i) for i in range(len(dets))])
        return ids_per_frame

    def _pan_clip(self):
        """15 px/frame pan from t=4 with 18-px boxes: per-frame IoU of the
        same object across frames is ~0.09, far below match_thresh, so
        IoU-only association loses the tracks; GMC compensation keeps them."""
        boxes0 = [(60, 60, 78, 78), (170, 100, 188, 118), (250, 170, 268, 188)]
        frames, dets = [], []
        for t in range(9):
            pan = max(t - 3, 0) * 15
            b = [(x1 - pan, y1, x2 - pan, y2) for x1, y1, x2, y2 in boxes0]
            dets.append(b)
            frames.append(_render(b, pan=pan))
        return dets, frames

    def test_gmc_survives_camera_pan(self):
        from bsyolo_tpu.trackers.bot_sort import BOTSORT
        from bsyolo_tpu.trackers.byte_tracker import BYTETracker

        dets, frames = self._pan_clip()
        tr = BOTSORT(gmc_method="sparseOptFlow", track_buffer=30)
        ids = self._run(tr, dets, frames)
        # same physical object keeps its ID through the whole pan
        assert ids[3] == ids[8] != [None, None, None], ids

        # contrast: plain ByteTrack (no GMC) loses/renumbers under the pan
        byte_ids = self._run(BYTETracker(track_buffer=30), dets, frames)
        assert byte_ids[3] != byte_ids[8], byte_ids

    def test_reid_recovers_identity_after_gap(self):
        """Two same-size objects with distinct colors swap positions during
        a 3-frame detection gap; appearance (ReID) assigns the original IDs
        back, position alone would swap them."""
        from bsyolo_tpu.trackers.bot_sort import BOTSORT

        red, blue = (0, 0, 220), (220, 0, 0)  # BGR
        a0, b0 = (40, 60, 80, 100), (200, 60, 240, 100)
        frames, dets = [], []
        for t in range(3):  # establish both tracks
            dets.append([a0, b0])
            frames.append(_render([a0, b0], colors=[red, blue]))
        for t in range(3):  # gap: no detections (objects occluded)
            dets.append([])
            frames.append(_render([], colors=[]))
        # reappear SWAPPED in position: red is now right, blue left
        dets.append([b0, a0])
        frames.append(_render([b0, a0], colors=[red, blue]))
        tr = BOTSORT(with_reid=True, gmc_method=None, proximity_thresh=1.0, appearance_thresh=0.9,
                     track_buffer=30, match_thresh=0.99)
        ids = self._run(tr, dets, frames)
        established = ids[2]
        final = ids[6]
        assert None not in established
        # det 0 (red, at b0's old spot) must get red's original ID
        assert final[0] == established[0], (established, final)
        assert final[1] == established[1], (established, final)

    def test_botsort_yaml_roundtrip(self):
        from bsyolo_tpu.trackers import BOTSORT, create_tracker

        tr = create_tracker("botsort.yaml")
        assert isinstance(tr, BOTSORT)
        assert tr.gmc is not None
        tr2 = create_tracker("bytetrack.yaml")
        assert not isinstance(tr2, BOTSORT)
