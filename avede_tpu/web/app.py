"""Streamlit UI (role of reference ``src/web/streamlit_app.py``).

Three modes behind a sidebar radio, matching the reference
(``streamlit_app.py:313-318``): Text Query (mvp/reranked/advanced),
Enhanced Person Detection (threshold/frame-skip/temporal sliders,
progress bar, effectiveness report), and Image Matching (mode radio with
explanations, per-method score breakdowns, inline clip playback).

Unlike the reference — whose Streamlit page constructs its OWN
``VideoProcessor`` and bypasses the REST API entirely (SURVEY.md §1) —
this UI talks to the API server over HTTP, so both front doors share
one model instance and one embedding cache. streamlit is not installed
in the build image; import is gated and ``/ui`` (web/builtin.py) serves
the dependency-free UI instead.
"""

from __future__ import annotations

import json
import os

API = os.environ.get("AVEDE_API", "http://localhost:8000")


def main() -> None:  # pragma: no cover — requires streamlit
    import requests
    import streamlit as st

    st.set_page_config(page_title="Video Event Detection", layout="wide")
    st.title("🎬 Advanced Video Event Detection & Extraction (TPU)")

    mode = st.sidebar.radio(
        "Mode", ["Text Query", "Enhanced Person Detection",
                 "Image Matching"])

    # --- shared upload ---
    st.sidebar.header("Video")
    up = st.sidebar.file_uploader("Upload video",
                                  type=["mp4", "avi", "mov", "mkv", "webm"])
    if up is not None and st.sidebar.button("Upload"):
        r = requests.post(f"{API}/api/upload",
                          files={"file": (up.name, up.getvalue())})
        st.session_state["video_id"] = r.json().get("video_id")
    videos = requests.get(f"{API}/api/videos").json()["videos"]
    vid = st.sidebar.selectbox(
        "Video", [v["video_id"] for v in videos],
        index=len(videos) - 1 if videos else 0) if videos else None

    if mode == "Text Query":
        query = st.text_input("Describe the event",
                              "a person walking")
        qmode = st.selectbox("Pipeline", ["mvp", "reranked", "advanced"])
        top_k = st.slider("Top K", 1, 30, 10)
        if st.button("Search") and vid:
            with st.spinner("Scanning video on TPU..."):
                r = requests.post(f"{API}/api/query", json={
                    "video_id": vid, "query": query, "mode": qmode,
                    "top_k": top_k}).json()
            st.metric("Events found", r.get("total_found", 0))
            for res in r.get("results", []):
                with st.expander(
                        f"t={res['timestamp']:.1f}s  "
                        f"conf={res['confidence']:.3f}"):
                    st.json(res)
                    if res.get("clip_filename"):
                        clip = requests.get(
                            f"{API}/api/download/{res['clip_filename']}")
                        st.video(clip.content)

    elif mode == "Enhanced Person Detection":
        ref = st.file_uploader("Reference person image",
                               type=["jpg", "jpeg", "png"])
        thr = st.slider("Similarity threshold", 0.0, 1.0, 0.6)
        skip = st.slider("Frame skip", 1, 30, 5)
        temporal = st.checkbox("Temporal consistency", True)
        save_frames = st.checkbox("Save annotated frames", False)
        if st.button("Find person") and vid and ref:
            img = requests.post(
                f"{API}/api/upload-image",
                files={"file": (ref.name, ref.getvalue())}).json()
            with st.spinner("Searching..."):
                r = requests.post(
                    f"{API}/api/enhanced-person-detection", json={
                        "video_id": vid, "image_id": img["image_id"],
                        "similarity_threshold": thr, "frame_skip": skip,
                        "temporal_consistency": temporal,
                        "save_annotated_frames": save_frames}).json()
            s = r.get("summary", {})
            c1, c2, c3 = st.columns(3)
            c1.metric("Matches", r.get("total_found", 0))
            c2.metric("Best similarity",
                      f"{s.get('best_similarity', 0):.3f}")
            c3.metric("FPS", f"{s.get('fps', 0):.1f}")
            st.subheader("Presence segments")
            for seg in s.get("presence_segments", []):
                st.write(f"• {seg[0]:.1f}s → {seg[1]:.1f}s")
            st.json(s)

    else:  # Image Matching
        ref = st.file_uploader("Reference image",
                               type=["jpg", "jpeg", "png"])
        mmode = st.radio("Matching mode",
                         ["smart_match", "cross_domain", "object_focused",
                          "fast_match"],
                         help="smart_match analyses the reference image "
                              "and picks an ensemble; cross_domain "
                              "handles color↔grayscale; object_focused "
                              "ignores background; fast_match is "
                              "CLIP-only.")
        thr = st.slider("Similarity threshold", 0.0, 1.0, 0.55)
        if st.button("Match") and vid and ref:
            files = {"reference_image": (ref.name, ref.getvalue())}
            data = {"video_id": vid, "matching_mode": mmode,
                    "similarity_threshold": str(thr)}
            with st.spinner("Matching..."):
                r = requests.post(f"{API}/api/image-matching",
                                  files=files, data=data).json()
            st.metric("Matches", r.get("total_found", 0))
            for res in r.get("results", []):
                with st.expander(
                        f"t={res['timestamp']:.1f}s  "
                        f"sim={res['similarity']:.3f} "
                        f"({res['method']})"):
                    st.json(res.get("breakdown", res))


if __name__ == "__main__":
    main()
