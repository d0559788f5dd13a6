"""Cross-video library search.

A capability the reference cannot express (its architecture re-decodes
and re-embeds per request): search EVERY uploaded video for a text
query in one shot. The embedding cache (``io/embedding_cache.py``)
already holds one unit-norm table per video; library search
concatenates them, runs ONE [N_total, D] × [D] matmul on device, and
returns per-video top hits. Videos without cached embeddings are
embedded on first search and cached.

Exposed at ``POST /api/search-library``.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..pipelines.phase1 import Phase1Scan
from ..utils.config import settings
from ..utils.logging import get_logger

logger = get_logger(__name__)


class LibrarySearch:
    def __init__(self, phase1: Phase1Scan) -> None:
        self.phase1 = phase1

    def list_videos(self) -> List[str]:
        base = Path(settings.VIDEO_DIR)
        if not base.exists():
            return []
        return sorted(p.stem for p in base.glob("*")
                      if p.suffix.lstrip(".").lower()
                      in settings.SUPPORTED_FORMATS)

    def search(self, query: str, top_k: int = 10,
               threshold: Optional[float] = None,
               per_video_k: int = 3,
               video_ids: Optional[List[str]] = None) -> Dict:
        t0 = time.time()
        threshold = (settings.CONFIDENCE_THRESHOLD if threshold is None
                     else threshold)
        ids = video_ids or self.list_videos()
        tables: List[np.ndarray] = []
        spans: List[tuple] = []   # (video_id, timestamps)
        for vid in ids:
            try:
                path = self._resolve(vid)
                emb, ts = self.phase1.frame_embeddings(path, vid)
            except Exception as exc:  # noqa: BLE001 — skip bad videos
                logger.warning("library: skipping %s (%s)", vid, exc)
                continue
            tables.append(emb)
            spans.append((vid, ts))
        if not tables:
            return {"results": [], "total_found": 0,
                    "metadata": {"videos_searched": 0,
                                 "processing_time": time.time() - t0}}

        all_emb = np.concatenate(tables, axis=0)
        q = self.phase1.engine.embed_texts(query)[0]
        scores = all_emb @ q

        results: List[Dict] = []
        offset = 0
        for (vid, ts), emb in zip(spans, tables):
            n = len(emb)
            s = scores[offset: offset + n]
            offset += n
            order = np.argsort(s)[::-1][:per_video_k]
            for i in order:
                if s[i] >= threshold:
                    results.append({
                        "video_id": vid,
                        "timestamp": float(ts[i]),
                        "confidence": float(s[i]),
                        "frame_index": int(i),
                    })
        results.sort(key=lambda r: r["confidence"], reverse=True)
        results = results[:top_k]
        return {
            "results": results,
            "total_found": len(results),
            "metadata": {
                "videos_searched": len(tables),
                "frames_scored": int(len(scores)),
                "processing_time": time.time() - t0,
            },
        }

    def _resolve(self, video_id: str) -> str:
        base = Path(settings.VIDEO_DIR)
        for ext in settings.SUPPORTED_FORMATS:
            p = base / f"{video_id}.{ext}"
            if p.exists():
                return str(p)
        raise FileNotFoundError(video_id)
