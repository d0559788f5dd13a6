"""Accuracy evaluation harness.

The reference publishes "85–95% accuracy" with no methodology
(``README.md:305``, BASELINE.md). This harness defines reproducible
metrics:

- ``image``  — reference-image retrieval over synthetic videos with
  known ground truth: precision@k / recall of finding the frames that
  contain the reference subject. Meaningful even without pretrained
  weights (image-side features separate the synthetic classes).
- ``grounding`` — temporal localization: train the grounding head
  (``models/univtg.py``) on synthetic (features, segment) pairs, then
  measure mean temporal IoU of predicted vs ground-truth segments on
  held-out samples — demonstrating the training loop improves
  localization end-to-end.
- ``text`` — text→video event retrieval; requires real CLIP weights
  (``settings.CLIP_WEIGHTS``) to be meaningful and reports a warning
  otherwise.

Prints one JSON object of metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile

import numpy as np

from avede_tpu.utils.platform import apply_platform_env

# ---------------------------------------------------------------------------
# image-retrieval eval
# ---------------------------------------------------------------------------

def eval_image_retrieval(seed: int = 0, n_subjects: int = 4) -> dict:
    import cv2

    from avede_tpu.models.clip import init_clip, tiny_test_config
    from avede_tpu.parallel.embed import ClipEngine
    from avede_tpu.services.image_matcher import ImageMatcher
    from avede_tpu.utils.config import settings

    rng = np.random.default_rng(seed)
    if settings.CLIP_WEIGHTS:
        engine = ClipEngine()
    else:
        _, params = init_clip(tiny_test_config(), seed=0)
        engine = ClipEngine(cfg=tiny_test_config(), params=params)
    matcher = ImageMatcher(engine, cache=None)

    # n_subjects distinct textured patches; each appears in a known
    # 2-second span of a video
    patches = [rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
               for _ in range(n_subjects)]
    # the reference "image" a user supplies is a frame showing the
    # subject (global matchers compare whole images, not crops)
    subjects = []
    for p in patches:
        frame = np.full((120, 160, 3), 60, np.uint8)
        frame[40:80, 60:100] = p
        subjects.append(frame)
    fps, span = 4.0, 8  # frames per subject span
    tmp = tempfile.mkdtemp(prefix="avede_eval_")
    video = os.path.join(tmp, "eval.mp4")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                        (160, 120))
    gt = {}
    t = 0
    for si, patch in enumerate(patches):
        gt[si] = (t / fps, (t + span) / fps)
        for _ in range(span):
            frame = np.full((120, 160, 3), 60, np.uint8)
            frame[40:80, 60:100] = patch
            w.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
            t += 1
        for _ in range(span):  # gap of background
            frame = np.full((120, 160, 3), 60, np.uint8)
            w.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
            t += 1
    w.release()

    hits = 0
    p_at_1 = 0
    for si, subj in enumerate(subjects):
        # without trained CLIP weights the classical stages carry the
        # signal, so evaluate the staged 'traditional' mode
        matches = matcher.match_image_to_video(
            video, subj, mode="traditional", threshold=0.0, top_k=5,
            video_id=f"eval_{seed}_{si}")
        lo, hi = gt[si]
        if matches and lo - 0.3 <= matches[0]["timestamp"] <= hi + 0.3:
            p_at_1 += 1
        if any(lo - 0.3 <= m["timestamp"] <= hi + 0.3 for m in matches):
            hits += 1
    return {"precision_at_1": p_at_1 / n_subjects,
            "recall_at_5": hits / n_subjects,
            "n_subjects": n_subjects}


# ---------------------------------------------------------------------------
# temporal-grounding eval
# ---------------------------------------------------------------------------

def eval_grounding(seed: int = 0, steps: int = 150) -> dict:
    import jax
    import jax.numpy as jnp

    from avede_tpu.models.univtg import tiny_grounding_config
    from avede_tpu.parallel.mesh import build_mesh
    from avede_tpu.parallel.train import (create_grounding_train_state,
                                          make_grounding_train_step)

    mesh = build_mesh(jax.devices()[:1])
    cfg = tiny_grounding_config(input_dim=16)
    model, state = create_grounding_train_state(cfg, learning_rate=3e-3)
    step = make_grounding_train_step(model, mesh)
    rng = np.random.default_rng(seed)
    B, N, D = 16, 48, 16

    def make_batch():
        text = rng.normal(size=(B, D)).astype(np.float32)
        frames = rng.normal(size=(B, N, D)).astype(np.float32) * 0.1
        sal = np.zeros((B, N), np.float32)
        off = np.zeros((B, N, 2), np.float32)
        segs = []
        for b in range(B):
            s = int(rng.integers(4, N - 12))
            e = s + int(rng.integers(4, 10))
            frames[b, s:e] += text[b] * 0.6
            sal[b, s:e] = 1.0
            for i in range(s, e):
                off[b, i] = [i - s, e - i]
            segs.append((s, e))
        return ([jnp.asarray(x) for x in (frames, text, sal, off,
                                          np.ones((B, N), bool))], segs)

    for _ in range(steps):
        args, _ = make_batch()
        state, metrics = step(state, *args)

    # held-out eval: temporal IoU of argmax-saliency segment
    args, segs = make_batch()
    sal, off = model.apply({"params": state.params}, args[0], args[1],
                           args[4])
    sal, off = np.asarray(sal), np.asarray(off)
    ious = []
    for b, (s, e) in enumerate(segs):
        i = int(np.argmax(sal[b]))
        ps, pe = i - off[b, i, 0], i + off[b, i, 1]
        inter = max(0.0, min(e, pe) - max(s, ps))
        union = max(e, pe) - min(s, ps)
        ious.append(inter / union if union > 0 else 0.0)
    return {"mean_temporal_iou": float(np.mean(ious)),
            "final_loss": float(metrics["loss"]),
            "train_steps": steps}


# ---------------------------------------------------------------------------

def main() -> None:
    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", choices=["image", "grounding", "all"],
                        default="all")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    out = {}
    if args.mode in ("image", "all"):
        out["image_retrieval"] = eval_image_retrieval(args.seed)
    if args.mode in ("grounding", "all"):
        out["temporal_grounding"] = eval_grounding(args.seed)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
