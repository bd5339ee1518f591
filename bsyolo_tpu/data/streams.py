"""Threaded multi-stream video ingestion (reference data/loaders.py
LoadStreams) + screenshot capture (LoadScreenshots).

One daemon thread per source keeps only the LATEST decoded frame (or a
short buffer), so slow inference never builds unbounded decode backlogs —
the behavior live camera feeds need. Sources: webcam indices, video files,
rtsp/http URLs, or a .streams text file listing one source per line.

    streams = LoadStreams(["0", "rtsp://cam/1"])   # or LoadStreams("list.streams")
    for frames, paths in streams:                   # lock-step latest frames
        results = model.predict(frames)
    streams.close()
"""

from __future__ import annotations

import threading
import time
from pathlib import Path
from typing import List, Optional, Sequence, Union

import numpy as np


class LoadStreams:
    """Latest-frame threaded reader over N video sources."""

    def __init__(self, sources: Union[str, Sequence], vid_stride: int = 1, buffer: bool = False):
        import cv2

        if isinstance(sources, (str, Path)) and str(sources).endswith(".streams"):
            sources = [s.strip() for s in Path(sources).read_text().splitlines() if s.strip()]
        elif isinstance(sources, (str, Path, int)):
            sources = [sources]
        self.sources = [str(s) for s in sources]
        self.vid_stride = vid_stride
        self.buffer = buffer  # True: keep every frame; False: latest only
        self.running = True
        self.caps = []
        self.frames: List[list] = [[] for _ in self.sources]
        self.locks = [threading.Lock() for _ in self.sources]
        self.alive = [True] * len(self.sources)  # per-stream liveness
        self.threads = []
        self.fps = []
        for i, s in enumerate(self.sources):
            src = int(s) if s.isnumeric() else s
            cap = cv2.VideoCapture(src)
            if not cap.isOpened():
                raise ConnectionError(f"cannot open stream {s}")
            self.caps.append(cap)
            self.fps.append(max(cap.get(cv2.CAP_PROP_FPS) or 30.0, 1.0))
            ok, frame = cap.read()
            if not ok:
                raise ConnectionError(f"cannot read from stream {s}")
            self.frames[i].append(frame)
            if not hasattr(self, "_last"):
                self._last: List = [None] * len(self.sources)
            self._last[i] = frame
            t = threading.Thread(target=self._reader, args=(i,), daemon=True)
            t.start()
            self.threads.append(t)

    def _reader(self, i: int):
        n = 0
        cap = self.caps[i]
        while self.running and cap.isOpened():
            ok = cap.grab()
            if not ok:
                break
            n += 1
            if n % self.vid_stride:
                continue
            ok, frame = cap.retrieve()
            if not ok:
                break
            with self.locks[i]:
                if self.buffer:
                    self.frames[i].append(frame)
                else:
                    self.frames[i] = [frame]
        # only THIS stream ended; the others keep running (a dropped camera
        # must not kill the healthy feeds)
        self.alive[i] = False

    def __iter__(self):
        return self

    def __next__(self):
        if not self.running or not (any(self.alive) or any(self.frames)):
            raise StopIteration
        out = []
        for i in range(len(self.sources)):
            frame = None
            for _ in range(200):  # ~2 s grace for a fresh frame
                with self.locks[i]:
                    if self.frames[i]:
                        frame = self.frames[i].pop(0) if self.buffer else self.frames[i][-1]
                        if not self.buffer:
                            self.frames[i] = []
                        self._last[i] = frame
                        break
                if not (self.running and self.alive[i]):
                    break
                time.sleep(0.01)
            if frame is None:
                # dead/stalled stream: repeat its last frame so the healthy
                # streams keep flowing; stop only when every stream is done
                frame = self._last[i]
                if frame is None:
                    raise StopIteration
            out.append(frame)
        if not any(self.alive) and not any(self.frames):
            self.running = False  # drained: next call stops
        return out, list(self.sources)

    def close(self):
        self.running = False
        for t in self.threads:
            t.join(timeout=1.0)
        for cap in self.caps:
            try:
                cap.release()
            except Exception:
                pass

    def __len__(self):
        return len(self.sources)


class LoadScreenshots:
    """Screen-region capture source (reference LoadScreenshots; needs `mss`).

    Yields (frame BGR, "screen") forever. Gated on the mss package — absent
    in this offline image, so construction raises with guidance.
    """

    def __init__(self, source: str = "screen 0"):
        try:
            import mss  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "screenshot capture needs the 'mss' package (not bundled in this "
                "offline image); pass a camera index / video / URL instead"
            ) from e
        parts = str(source).split()
        self.screen = int(parts[1]) if len(parts) > 1 else 0
        self.region = [int(p) for p in parts[2:6]] if len(parts) >= 6 else None

    def __iter__(self):
        import mss

        with mss.mss() as sct:
            mon = sct.monitors[self.screen + 1]
            box = (
                {"left": self.region[0], "top": self.region[1],
                 "width": self.region[2], "height": self.region[3]}
                if self.region else mon
            )
            while True:
                img = np.asarray(sct.grab(box))[:, :, :3]
                yield img, "screen"
