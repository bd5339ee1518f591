"""Threaded stream loader (LoadStreams analog)."""

import sys
import time
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))


def _make_video(path, n_frames=30, size=(64, 48)):
    import cv2

    w, h = size
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    for i in range(n_frames):
        frame = np.full((h, w, 3), i * 8 % 255, np.uint8)
        vw.write(frame)
    vw.release()
    return path


class TestLoadStreams:
    def test_single_file_stream(self, tmp_path):
        from bsyolo_tpu.data.streams import LoadStreams

        vid = _make_video(tmp_path / "a.mp4")
        s = LoadStreams([str(vid)], buffer=True)
        frames_seen = 0
        try:
            for frames, paths in s:
                assert len(frames) == 1 and frames[0].shape == (48, 64, 3)
                frames_seen += 1
                if frames_seen >= 10:
                    break
        finally:
            s.close()
        assert frames_seen >= 10

    def test_multi_stream_lockstep(self, tmp_path):
        from bsyolo_tpu.data.streams import LoadStreams

        v1 = _make_video(tmp_path / "a.mp4", 40)
        v2 = _make_video(tmp_path / "b.mp4", 40)
        s = LoadStreams([str(v1), str(v2)], buffer=True)
        try:
            frames, paths = next(iter(s))
            assert len(frames) == 2 and len(paths) == 2
        finally:
            s.close()

    def test_streams_file(self, tmp_path):
        from bsyolo_tpu.data.streams import LoadStreams

        vid = _make_video(tmp_path / "a.mp4")
        lst = tmp_path / "cams.streams"
        lst.write_text(f"{vid}\n")
        s = LoadStreams(str(lst))
        try:
            frames, _ = next(iter(s))
            assert frames[0].shape == (48, 64, 3)
        finally:
            s.close()

    def test_screenshots_gated(self):
        from bsyolo_tpu.data.streams import LoadScreenshots

        with pytest.raises(ImportError):
            LoadScreenshots("screen 0")

    def test_bad_source_raises(self):
        from bsyolo_tpu.data.streams import LoadStreams

        with pytest.raises(ConnectionError):
            LoadStreams(["/nonexistent/video.mp4"])
