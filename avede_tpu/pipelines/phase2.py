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

    @property
    def captioner(self):
        if self._captioner is None:
            from ..services.captioner import make_reranker

            self._captioner = make_reranker(self.phase1.engine)
        return self._captioner

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

        # read ONLY the candidate middle frames (one capture, K seeks)
        frames = self.phase1.reader.read_frames_at(
            video_path, [c["timestamp"] for c in candidates])
        # reranker: BLIP captions + CLIP text similarity, or BLIP-2
        # Q-Former ITC scores (services/captioner.make_reranker)
        cap_sim, aux = self.captioner.rerank_scores(frames, query)

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
