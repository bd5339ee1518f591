"""Streamlit live-inference UI (reference solutions/streamlit_inference.py).

Gated on the ``streamlit`` package (not bundled in the TPU image); run with
``streamlit run -m bsyolo_tpu.solutions.streamlit_app`` where available.
"""

from __future__ import annotations


def inference(model_path: str = "yolo11.yaml", **kwargs):
    """Launch the webcam/video inference dashboard."""
    try:
        import streamlit as st
    except ImportError as e:
        raise ImportError(
            "streamlit is not installed in this environment; "
            "`pip install streamlit` on a host with UI access to use this solution"
        ) from e

    import cv2
    import numpy as np

    from bsyolo_tpu.model import YOLO

    st.title("BS-YOLO TPU inference")
    source = st.sidebar.text_input("Source (video path / camera index)", "0")
    conf = st.sidebar.slider("Confidence", 0.0, 1.0, 0.25, 0.01)
    iou = st.sidebar.slider("IoU", 0.0, 1.0, 0.7, 0.01)
    run = st.sidebar.button("Start")
    frame_slot = st.empty()

    if run:
        model = YOLO(model_path)
        cap = cv2.VideoCapture(int(source) if source.isdigit() else source)
        try:
            while cap.isOpened():
                ok, frame = cap.read()
                if not ok:
                    break
                res = model.predict(frame, conf=conf, iou=iou, **kwargs)[0]
                frame_slot.image(res.plot()[..., ::-1], channels="RGB")
        finally:
            cap.release()


if __name__ == "__main__":
    inference()
