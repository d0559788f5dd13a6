"""End-to-end capability demo harness.

Role model: the reference's root-level ``test_enhanced_matching.py``
(``/root/reference/test_enhanced_matching.py``): generate a synthetic
subject in multiple background/color variants, write a real MP4, run
the image-matching pipeline in several modes, and report whether the
system matches the subject across backgrounds and across the
color↔grayscale domain gap — the capability the reference measures at
0% and targets at 85%+ (BASELINE.md).

Run: ``python capability_report.py``  (CPU-friendly; uses tiny models
unless real weights are configured).
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np

from avede_tpu.utils.platform import (apply_platform_env,
                                      enable_compile_cache)

def make_subject(rng) -> np.ndarray:
    """A distinctive multi-part 'subject' (colored blob figure)."""
    img = np.zeros((60, 40, 3), np.uint8)
    img[5:20, 12:28] = [200, 160, 120]    # head
    img[20:45, 8:32] = [40, 80, 200]      # torso
    img[45:60, 10:18] = [30, 30, 90]      # legs
    img[45:60, 22:30] = [30, 30, 90]
    noise = rng.integers(-15, 15, img.shape)
    return np.clip(img.astype(int) + noise, 0, 255).astype(np.uint8)


def place(subject: np.ndarray, background: np.ndarray,
          gray: bool = False) -> np.ndarray:
    import cv2

    frame = background.copy()
    s = subject
    if gray:
        g = cv2.cvtColor(s, cv2.COLOR_RGB2GRAY)
        s = cv2.cvtColor(g, cv2.COLOR_GRAY2RGB)
    h, w = s.shape[:2]
    y, x = 30, 60
    frame[y:y + h, x:x + w] = s
    return frame


def main() -> None:
    apply_platform_env()
    enable_compile_cache()
    import cv2

    from avede_tpu.models.clip import init_clip, tiny_test_config
    from avede_tpu.parallel.embed import ClipEngine, set_engine
    from avede_tpu.parallel.mesh import build_mesh
    from avede_tpu.services.image_matcher import ImageMatcher
    from avede_tpu.utils.config import settings

    rng = np.random.default_rng(0)
    use_real = bool(settings.CLIP_WEIGHTS)
    if use_real:
        engine = ClipEngine()
        yolo = None
    else:
        model, params = init_clip(tiny_test_config(), seed=0)
        engine = ClipEngine(cfg=tiny_test_config(), params=params)
        from avede_tpu.models.yolo import init_yolo, tiny_yolo_config
        from avede_tpu.services.detector import YoloService

        ycfg = tiny_yolo_config()
        _, yvars = init_yolo(ycfg, seed=0)
        yolo = YoloService(cfg=ycfg, variables=yvars)
    set_engine(engine)
    matcher = ImageMatcher(engine, yolo=yolo, cache=None)

    subject = make_subject(rng)
    backgrounds = [
        np.full((144, 176, 3), v, np.uint8)
        for v in (20, 90, 160, 230)
    ] + [
        rng.integers(0, 255, (144, 176, 3), dtype=np.uint8)
        for _ in range(2)
    ]
    variants = ([place(subject, bg) for bg in backgrounds]
                + [place(subject, backgrounds[0], gray=True),
                   place(subject, backgrounds[4], gray=True)])

    tmp = tempfile.mkdtemp(prefix="avede_cap_")
    video_path = os.path.join(tmp, "variants.mp4")
    writer = cv2.VideoWriter(video_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             4.0, (176, 144))
    for v in variants:
        for _ in range(4):  # 1s per variant
            writer.write(cv2.cvtColor(v, cv2.COLOR_RGB2BGR))
    writer.release()

    report = {"video": video_path, "n_variants": len(variants),
              "weights": "real" if use_real else "random-init",
              "modes": {}}
    for mode in ("cross_domain", "smart_match", "traditional",
                 "fast_match"):
        matches = matcher.match_image_to_video(
            video_path, subject, mode=mode, threshold=0.0, top_k=20,
            video_id=f"cap_{mode}")
        hit_ts = sorted({round(m["timestamp"]) for m in matches})
        # a variant counts as matched if any frame inside its second hit
        matched = {int(t) for t in hit_ts if 0 <= t < len(variants)}
        report["modes"][mode] = {
            "matches": len(matches),
            "variants_matched": len(matched),
            "variant_coverage": round(len(matched) / len(variants), 2),
            "best_similarity": round(
                max((m["similarity"] for m in matches), default=0.0), 3),
        }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
