"""Streamlit live-inference UI (reference solutions/streamlit_inference.py).

Reference surface (streamlit_inference.py:14-181): model dropdown, source
selector (webcam / uploaded video), tracking toggle, confidence + IoU
sliders, class multiselect, Start/Stop, and side-by-side original/annotated
frame panes. The rebuild splits it into:

- :class:`InferenceCore` — model loading and per-frame predict-or-track with
  class filtering, no UI imports; tests drive it headlessly
  (tests/test_solutions.py);
- :func:`inference` — the streamlit shell, gated on the ``streamlit``
  package (not bundled in the TPU image). Run with
  ``streamlit run bsyolo_tpu/solutions/streamlit_app.py [model]``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

# Bundled model zoo entries offered in the dropdown (the reference lists its
# GITHUB_ASSETS_STEMS yolo11* set — here the offline-resolvable YAML zoo).
ZOO_MODELS = ["yolo11n", "yolo11s", "yolo11m", "yolo11l", "yolo11x"]


class InferenceCore:
    """UI-independent inference state: model, thresholds, class filter.

    Mirrors the reference Inference attributes (streamlit_inference.py:44-62)
    minus the streamlit handles.
    """

    def __init__(self, model: Optional[str] = None):
        self.model_path = model
        self.model = None
        self.conf = 0.25
        self.iou = 0.45
        self.enable_trk = False
        self.selected_ind: Optional[List[int]] = None  # None = all classes

    def available_models(self) -> List[str]:
        """Dropdown contents; a user-supplied model leads (reference
        configure, :129-131)."""
        models = list(ZOO_MODELS)
        if self.model_path:
            stem = str(self.model_path).rsplit(".", 1)[0]
            if stem not in models:
                models.insert(0, self.model_path)
        return models

    def load(self, selected: Optional[str] = None) -> List[str]:
        """Instantiate the YOLO facade; returns class names for the
        multiselect (reference configure, :134-137)."""
        from bsyolo_tpu.model import YOLO

        self.model = YOLO(selected or self.model_path or "yolo11n.yaml")
        names = self.model.names
        return [names[k] for k in sorted(names)]

    def select_classes(self, class_names: Sequence[str], chosen: Sequence[str]):
        """Map chosen names to indices (reference configure, :140-144);
        empty selection means no filter."""
        self.selected_ind = [class_names.index(c) for c in chosen] or None

    def process_frame(self, frame: np.ndarray) -> np.ndarray:
        """One BGR frame -> annotated BGR frame, tracking if enabled
        (reference inference loop, :164-171)."""
        if self.model is None:
            self.load()
        kwargs = dict(conf=self.conf, iou=self.iou, classes=self.selected_ind)
        if self.enable_trk:
            results = self.model.track(frame, persist=True, **kwargs)
        else:
            results = self.model.predict(frame, **kwargs)
        return results[0].plot()


def inference(model: Optional[str] = None):
    """Launch the dashboard (reference inference, :146-181)."""
    try:
        import streamlit as st
    except ImportError as e:
        raise ImportError(
            "streamlit is not installed in this environment; "
            "`pip install streamlit` on a host with UI access to use this solution"
        ) from e

    import cv2

    core = InferenceCore(model)

    st.set_page_config(page_title="BS-YOLO TPU", layout="wide")
    st.markdown(
        "<h1 style='text-align:center'>BS-YOLO TPU inference</h1>",
        unsafe_allow_html=True,
    )

    st.sidebar.title("User Configuration")
    source = st.sidebar.selectbox("Video", ("webcam", "video"))
    core.enable_trk = st.sidebar.radio("Enable Tracking", ("Yes", "No")) == "Yes"
    core.conf = float(st.sidebar.slider("Confidence Threshold", 0.0, 1.0, core.conf, 0.01))
    core.iou = float(st.sidebar.slider("IoU Threshold", 0.0, 1.0, core.iou, 0.01))

    vid_file_name = 0
    if source == "video":
        vid = st.sidebar.file_uploader("Upload Video File", type=["mp4", "mov", "avi", "mkv"])
        if vid is not None:
            with open("bsyolo_upload.mp4", "wb") as out:
                out.write(vid.read())
            vid_file_name = "bsyolo_upload.mp4"
        else:
            # without this, source='video' with no upload silently falls back
            # to VideoCapture(0) — the webcam — which is never what was asked
            vid_file_name = None
            st.sidebar.warning("Upload a video file to start.")

    selected_model = st.sidebar.selectbox("Model", core.available_models())
    with st.spinner("Loading model..."):
        class_names = core.load(selected_model)
    st.success("Model loaded successfully!")
    chosen = st.sidebar.multiselect("Classes", class_names, default=class_names[:3])
    core.select_classes(class_names, chosen)

    col1, col2 = st.columns(2)
    org_frame, ann_frame = col1.empty(), col2.empty()

    if st.sidebar.button("Start"):
        if vid_file_name is None:
            st.error("Source is 'video' but no file was uploaded.")
            return
        stop_button = st.button("Stop")
        cap = cv2.VideoCapture(vid_file_name)
        if not cap.isOpened():
            st.error("Could not open source.")
        while cap.isOpened():
            ok, frame = cap.read()
            if not ok:
                st.warning("Failed to read frame from source.")
                break
            annotated = core.process_frame(frame)
            if stop_button:
                cap.release()
                st.stop()
            org_frame.image(frame, channels="BGR")
            ann_frame.image(annotated, channels="BGR")
        cap.release()


if __name__ == "__main__":
    import sys

    inference(sys.argv[1] if len(sys.argv) > 1 else None)
