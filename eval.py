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
# text→video retrieval with a trained tiny CLIP
# ---------------------------------------------------------------------------

SHAPES = ("square", "circle", "triangle", "stripe")
COLORS = {"red": (220, 40, 40), "green": (40, 200, 60),
          "blue": (50, 80, 220), "yellow": (230, 220, 40)}


def _draw(shape: str, color, rng, size: int = 32) -> np.ndarray:
    import cv2

    img = np.full((size, size, 3),
                  rng.integers(20, 60), np.uint8)
    c = tuple(int(v) for v in color)
    cx, cy = size // 2 + int(rng.integers(-3, 4)), size // 2 + int(
        rng.integers(-3, 4))
    r = size // 4 + int(rng.integers(-2, 3))
    if shape == "square":
        cv2.rectangle(img, (cx - r, cy - r), (cx + r, cy + r), c, -1)
    elif shape == "circle":
        cv2.circle(img, (cx, cy), r, c, -1)
    elif shape == "triangle":
        pts = np.array([[cx, cy - r], [cx - r, cy + r], [cx + r, cy + r]])
        cv2.fillPoly(img, [pts], c)
    else:  # stripe
        cv2.rectangle(img, (0, cy - 3), (size, cy + 3), c, -1)
    noise = rng.integers(-10, 10, img.shape)
    return np.clip(img.astype(int) + noise, 0, 255).astype(np.uint8)


def eval_text_trained(seed: int = 0, steps: int = 400) -> dict:
    """Train a tiny CLIP contrastively on synthetic (shape image,
    caption) pairs, then measure text→video retrieval through the REAL
    phase-1 pipeline — the end-to-end proof that the whole path
    (tokenize → encode → cache → window top-k) learns."""
    import cv2
    import jax
    import jax.numpy as jnp

    from avede_tpu.models.clip import CLIPModel, tiny_test_config
    from avede_tpu.models.tokenizer import Tokenizer
    from avede_tpu.ops.preprocess import clip_preprocess
    from avede_tpu.parallel.embed import ClipEngine
    from avede_tpu.parallel.mesh import build_mesh
    from avede_tpu.parallel.train import (TrainState,
                                          clip_contrastive_loss)
    import optax

    rng = np.random.default_rng(seed)
    cfg = tiny_test_config()
    tok = Tokenizer(bpe_path=None, vocab_size=cfg.vocab_size,
                    context_len=cfg.max_text_len)
    from avede_tpu.models.clip import init_clip

    model, params = init_clip(cfg, seed=seed)
    tx = optax.adam(1e-3)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    pairs = [(s, cname) for s in SHAPES for cname in COLORS]

    @jax.jit
    def step(state, px, ids):
        def loss_fn(p):
            img, txt, scale = model.apply({"params": p}, px, ids)
            return clip_contrastive_loss(img, txt, scale)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    batch = len(pairs)  # one of each class per batch
    for _ in range(steps):
        imgs = np.stack([_draw(s, COLORS[c], rng) for s, c in pairs])
        caps = [f"a {c} {s}" for s, c in pairs]
        px = clip_preprocess(jnp.asarray(imgs), size=cfg.image_size)
        ids = jnp.asarray(tok(caps))
        state, loss = step(state, px, ids)

    # build a video: 3 s per held-out class instance
    engine = ClipEngine(cfg=cfg, params=jax.device_get(state.params),
                        mesh=build_mesh(jax.devices()[:1]))
    from avede_tpu.io.embedding_cache import EmbeddingCache
    from avede_tpu.pipelines.phase1 import Phase1Scan
    import tempfile

    tmp = tempfile.mkdtemp(prefix="avede_txt_")
    video = os.path.join(tmp, "shapes.mp4")
    fps, span = 4.0, 8
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                        (64, 64))
    order = list(pairs)
    rng.shuffle(order)
    gt = {}
    t = 0
    for s, c in order:
        gt[(s, c)] = (t / fps, (t + span) / fps)
        for _ in range(span):
            img = cv2.resize(_draw(s, COLORS[c], rng), (64, 64),
                             interpolation=cv2.INTER_NEAREST)
            w.write(cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            t += 1
    w.release()

    scan = Phase1Scan(engine, cache=None)
    scan.cache = None
    hits = 0
    for s, c in pairs:
        results = scan.process_video(video, f"a {c} {s}", top_k=3,
                                     threshold=-1.0,
                                     video_id=f"txt_{s}_{c}")
        lo, hi = gt[(s, c)]
        if results and lo - 1.1 <= results[0]["timestamp"] <= hi + 1.1:
            hits += 1
    return {"precision_at_1": hits / len(pairs),
            "classes": len(pairs), "train_steps": steps,
            "final_train_loss": float(loss)}


# ---------------------------------------------------------------------------

def main() -> None:
    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode",
                        choices=["image", "grounding", "text", "all"],
                        default="all")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    out = {}
    if args.mode in ("image", "all"):
        out["image_retrieval"] = eval_image_retrieval(args.seed)
    if args.mode in ("grounding", "all"):
        out["temporal_grounding"] = eval_grounding(args.seed)
    if args.mode in ("text", "all"):
        out["text_retrieval_trained"] = eval_text_trained(args.seed)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
