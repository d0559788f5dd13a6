"""Programmatic quickstart — the library surface without the server.

Runs on CPU with tiny random-init models (set ``CLIP_WEIGHTS`` etc. for
real checkpoints; see README "Weights"). Demonstrates:
  1. embedding a video once and querying it twice (cache hit),
  2. multi-query batch scan,
  3. reference-image matching,
  4. open-vocabulary detection.

    JAX_PLATFORMS=cpu python examples/quickstart.py <video.mp4>
"""

from __future__ import annotations

import os
import sys
import time

# runnable as `python examples/quickstart.py` from anywhere — put the
# repo root on sys.path (python puts only examples/ there)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from avede_tpu.utils.platform import apply_platform_env  # noqa: E402


def main() -> None:
    apply_platform_env()

    import numpy as np

    from avede_tpu.models.clip import init_clip, tiny_test_config
    from avede_tpu.parallel.embed import ClipEngine, set_engine
    from avede_tpu.pipelines.phase1 import Phase1Scan
    from avede_tpu.services.video_processor import VideoProcessor
    from avede_tpu.utils.config import settings

    if len(sys.argv) > 1:
        video = sys.argv[1]
    else:  # synthesize a demo clip
        import cv2
        import tempfile

        video = tempfile.mktemp(suffix=".mp4")
        w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"),
                            25.0, (96, 64))
        for i in range(75):
            frame = np.full((64, 96, 3), 32, np.uint8)
            x = int(i / 74 * 80)
            frame[24:40, x: x + 16] = 255
            w.write(frame)
        w.release()
        print(f"(no video given — synthesized {video})")

    if settings.CLIP_WEIGHTS:
        engine = ClipEngine()
    else:
        _, params = init_clip(tiny_test_config(), seed=0)
        engine = ClipEngine(cfg=tiny_test_config(), params=params)
        print("(random-init tiny CLIP — configure CLIP_WEIGHTS for real "
              "retrieval quality)")
    set_engine(engine)

    proc = VideoProcessor(engine=engine)

    print("\n1) text query (cold: decode + embed + scan)")
    t0 = time.time()
    out = proc.process_query(video, "a white square moving", mode="mvp",
                             threshold=-1.0, extract_clips=False,
                             video_id="demo")
    print(f"   {out['total_found']} events in {time.time()-t0:.2f}s; "
          f"top: {out['results'][:2]}")

    print("\n2) repeat query (embedding cache hit)")
    t0 = time.time()
    out = proc.process_query(video, "bright object", mode="mvp",
                             threshold=-1.0, extract_clips=False,
                             video_id="demo")
    print(f"   {out['total_found']} events in {time.time()-t0:.3f}s")

    print("\n3) multi-query batch over the cached table")
    scan = Phase1Scan(engine)
    batch = scan.process_queries(video, ["square", "circle", "person"],
                                 threshold=-1.0, video_id="demo")
    for q, res in batch.items():
        print(f"   {q!r}: best={res[0]['confidence']:.3f} "
              f"@{res[0]['timestamp']:.2f}s" if res else f"   {q!r}: none")

    print("\n4) reference-image matching (frame 37 as reference)")
    import cv2

    cap = cv2.VideoCapture(video)
    cap.set(cv2.CAP_PROP_POS_FRAMES, 37)
    _, ref = cap.read()
    cap.release()
    out = proc.process_image_matching(
        video, cv2.cvtColor(ref, cv2.COLOR_BGR2RGB),
        matching_mode="fast_match", similarity_threshold=0.2,
        extract_clips=False, video_id="demo")
    print(f"   {out['total_found']} matches; "
          f"top t={out['results'][0]['timestamp']:.2f}s "
          f"sim={out['results'][0]['similarity']:.3f}"
          if out["results"] else "   no matches")

    print("\n5) whole-library search (device-resident index)")
    import shutil

    from avede_tpu.services.library_search import LibrarySearch

    # the library scans settings.VIDEO_DIR — place the demo clip there
    # for the duration of the demo, then clean it back out
    os.makedirs(settings.VIDEO_DIR, exist_ok=True)
    lib_copy = os.path.join(settings.VIDEO_DIR, "quickstart_demo.mp4")
    shutil.copyfile(video, lib_copy)
    try:
        lib = LibrarySearch(proc.phase1)
        t0 = time.time()
        out = lib.search("a bright square", top_k=5, threshold=-1.0)
        meta = out["metadata"]
        print(f"   {meta.get('frames_scored', 0)} frames across "
              f"{meta.get('videos_searched', 0)} video(s) in "
              f"{time.time()-t0:.3f}s"
              + (" (on-chip index)" if meta.get("index") else ""))
    finally:
        os.remove(lib_copy)


if __name__ == "__main__":
    main()
