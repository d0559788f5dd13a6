"""Phase 2 — caption-based re-ranking of phase-1 candidates.

Reference behavior (``/root/reference/src/pipeline/phase2_reranker.py``):
phase 1 with 2× top_k → caption each candidate's middle frame with BLIP
→ combined score ``0.7·clip + 0.3·caption_similarity`` → sort, truncate.

Fixed by design relative to the reference:
- no second full video decode (``phase2_reranker.py:52`` re-extracts
  everything; here only the K candidate middle frames are read);
- caption similarity is real (the reference's text-similarity model is
  disabled so its combined score silently collapses to ``0.7·clip`` —
  SURVEY.md §2.6.9);
- captions decode as ONE batched scan program, not K separate
  ``generate`` calls.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional

import numpy as np

from ..utils.config import settings
from ..utils.logging import get_logger
from .phase1 import Phase1Scan

logger = get_logger(__name__)

CLIP_WEIGHT = 0.7
CAPTION_WEIGHT = 0.3


class Phase2Rerank:
    phase_name = "phase2_reranked"

    def __init__(self, phase1: Phase1Scan, captioner=None) -> None:
        self.phase1 = phase1
        self._captioner = captioner
        self._repr_cache = None
        self._cache_lock = threading.Lock()

    @property
    def captioner(self):
        if self._captioner is None:
            from ..services.captioner import make_reranker

            self._captioner = make_reranker(self.phase1.engine)
        return self._captioner

    def _reprs(self, video_path: str, video_id: Optional[str],
               timestamps: List[float]) -> List[np.ndarray]:
        """Query-independent rerank representations for candidate
        frames — cached per (video, frame, model) like embeddings, so a
        warm rerank touches neither the video file nor BLIP."""
        cap = self.captioner
        if video_id is None:
            from .phase1 import _default_video_id

            frames, _ = self._candidate_frames(
                video_path, _default_video_id(video_path), timestamps)
            return cap.frame_repr(frames)
        if self._repr_cache is None:
            with self._cache_lock:   # concurrent API requests share us
                if self._repr_cache is None:
                    from ..io.embedding_cache import FrameReprCache

                    # mirror phase1's cache gating: caching disabled →
                    # memory-only tier, nothing persisted to disk
                    emb_cache = self.phase1.cache
                    self._repr_cache = FrameReprCache(
                        cap.repr_kind,
                        cache_dir=str(emb_cache.dir) if emb_cache
                        else None,
                        persist=emb_cache is not None)
        tag = cap.repr_tag
        hit = self._repr_cache.get_many(video_id, tag, timestamps)
        keyf = self._repr_cache.key
        missing = [t for t in timestamps if keyf(t) not in hit]
        if missing:
            frames, ok = self._candidate_frames(video_path, video_id,
                                                missing)
            fresh = dict(zip((keyf(t) for t in missing),
                             cap.frame_repr(frames)))
            # persist only successfully-decoded frames: a transient
            # read failure must not pin a black-frame repr forever
            self._repr_cache.put_many(video_id, tag, {
                keyf(t): r for t, good, r in zip(
                    missing, ok, (fresh[keyf(t)] for t in missing))
                if good})
            hit.update(fresh)
        return [hit[keyf(t)] for t in timestamps]

    def _candidate_frames(self, video_path: str, video_id: str,
                          timestamps: List[float]):
        """Candidate frames for rerank: scan-retained decoded frames
        when the cold scan just ran (``Phase1Scan.retention`` — no
        second decode, the reference's double-decode fixed at zero IO
        cost), container seeks only for frames retention doesn't hold."""
        from ..io.frame_retention import ts_key

        retained = self.phase1.retention.lookup(video_id, timestamps)
        to_read = [t for t in timestamps if ts_key(t) not in retained]
        if not retained:
            return self.phase1.reader.read_frames_at(
                video_path, timestamps, return_ok=True)
        if to_read:
            read, read_ok = self.phase1.reader.read_frames_at(
                video_path, to_read, return_ok=True)
            read_map = {ts_key(t): (f, o) for t, f, o in
                        zip(to_read, read, read_ok)}
        else:
            read_map = {}
        sample = next(iter(retained.values()))
        frames = np.zeros((len(timestamps),) + sample.shape, np.uint8)
        ok = np.zeros((len(timestamps),), bool)
        for n, t in enumerate(timestamps):
            k = ts_key(t)
            if k in retained:
                frames[n], ok[n] = retained[k], True
            else:
                frames[n], ok[n] = read_map[k]
        return frames, ok

    def process_video(self, video_path: str, query: str,
                      top_k: Optional[int] = None,
                      threshold: Optional[float] = None,
                      video_id: Optional[str] = None) -> List[Dict]:
        top_k = top_k or settings.TOP_K_RESULTS
        candidates = self.phase1.process_video(
            video_path, query, top_k=top_k * 2, threshold=threshold,
            video_id=video_id)
        if not candidates:
            return []

        # query-independent reprs (BLIP captions / BLIP-2 image
        # features) come from the per-frame cache; only MISSING frames
        # are read (scan retention first, container seeks as fallback)
        # and run through the model. A warm rerank is therefore
        # text-similarity only.
        from ..utils.trace import trace

        with trace("phase2.rerank"):
            reprs = self._reprs(video_path, video_id,
                                [c["timestamp"] for c in candidates])
            cap_sim, aux = self.captioner.scores_from_repr(reprs, query)

        for c, extra, s in zip(candidates, aux, cap_sim):
            c.update(extra)
            c["caption_similarity"] = float(s)
            c["clip_score"] = c["confidence"]
            c["confidence"] = float(CLIP_WEIGHT * c["clip_score"]
                                    + CAPTION_WEIGHT * s)
            c["phase"] = self.phase_name
        candidates.sort(key=lambda c: c["confidence"], reverse=True)
        out = candidates[:top_k]
        logger.info("Phase 2: reranked %d candidates → top %d",
                    len(candidates), len(out))
        return out
