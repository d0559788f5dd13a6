"""Phase 1 — the core text→video scan.

Reference behavior (``/root/reference/src/pipeline/phase1_mvp.py:23-163``):
extract frames → sliding windows (16/8) → encode query → score each
window's MIDDLE frame by CLIP cosine → top-k above
``CONFIDENCE_THRESHOLD`` → result dicts
``{timestamp, confidence, phase, window_index}``.

TPU rebuild: all sampled frames are embedded in one sharded, jitted
program (``parallel/embed.py``); windows are index arithmetic
(``ops/windows.py``); scoring + top-k is a single fused XLA program
(``ClipEngine.query_window_topk`` — fused ids→text-tower→score→top-k
on a device-resident table). Embeddings persist in the versioned
cache so repeat queries skip decode AND embed entirely.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..io.embedding_cache import EmbeddingCache
from ..io.frame_retention import FrameRetention
from ..io.video_reader import VideoReader
from ..ops.dedup import FrameDeduper, rebatch
from ..ops.dedup import _signatures as _dedup_sigs
from ..ops.similarity import window_topk_multi
from ..ops.windows import window_middle_indices, window_timestamps
from ..parallel.embed import ClipEngine, get_engine
from ..utils.config import settings
from ..utils.logging import get_logger
from ..utils.trace import trace

logger = get_logger(__name__)


class Phase1Scan:
    phase_name = "phase1_mvp"

    def __init__(self, engine: Optional[ClipEngine] = None,
                 reader: Optional[VideoReader] = None,
                 cache: Optional[EmbeddingCache] = None) -> None:
        self.engine = engine or get_engine()
        self.reader = reader or VideoReader()
        self.cache = cache if cache is not None else (
            EmbeddingCache() if settings.EMBEDDING_CACHE_ENABLED else None)
        # scan-decoded frames of the latest video, kept for the
        # phase-2 reranker (cold advanced path: no second decode)
        self.retention = FrameRetention()

    def cache_tag(self) -> str:
        """Embedding-cache model tag (shared with every other table
        producer — see ``io.embedding_cache.table_tag``)."""
        from ..io.embedding_cache import table_tag

        return table_tag(self.engine.model_tag)

    # ------------------------------------------------------------------
    def frame_embeddings(self, video_path: str, video_id: Optional[str] = None
                         ) -> Tuple[np.ndarray, List[float]]:
        """Embeddings+timestamps for all sampled frames, cache-aware.

        Cold path overlaps decode with embed: ``stream_frames`` chunks
        feed ``embed_stream`` through a prefetch thread, so the device
        embeds chunk *i* while the host decodes chunk *i+1* (round-1
        verdict item 4 — decode/embed were strictly sequential)."""
        vid = video_id or _default_video_id(video_path)
        eps = settings.SCAN_DEDUP_EPS
        tag = self.cache_tag()
        if self.cache is not None:
            hit = self.cache.get(vid, tag, self.reader.sample_rate)
            if hit is not None:
                logger.info("Embedding cache hit for %s (%d frames)",
                            vid, len(hit[0]))
                return hit
        ts: List[float] = []
        shape: List[Tuple[int, int]] = []
        # fused pack: the compact-transfer i420 pack runs ON the decode
        # threads (N-way parallel) instead of serialized on the single
        # prefetch thread, and the decoder's per-frame BGR→RGB pass is
        # deleted — the pack matrix absorbs the channel order for
        # byte-identical output (``pack_frames_i420(src="bgr")``), so
        # embeddings and cache tags are unchanged. Retention keeps the
        # BGR scan-geometry chunks; lookup converts the K rerank
        # candidates back to RGB at identical pixel values.
        size = self.engine.cfg.image_size
        fused = (settings.SCAN_FUSED_PACK
                 and settings.SCAN_TRANSFER == "i420"
                 and size % 4 == 0)
        finish = None
        if fused:
            from ..ops.preprocess import pack_frames_i420

            def finish(bgr, chunk_ts):   # runs on decode threads
                if not shape:
                    shape.append(bgr.shape[1:3])
                # retain pre-dedup (the reranker needs frames the scan
                # skipped as duplicates too); zero-copy chunk reference
                self.retention.add(vid, bgr, chunk_ts)
                return pack_frames_i420(bgr, size, src="bgr")

            # gate signatures on the packed luma plane (the chroma
            # rows would dilute the 16×16 thumbnail)
            deduper = (FrameDeduper(
                eps, signature_fn=lambda f: _dedup_sigs(f[:, :size]))
                if eps > 0 else None)
        else:
            deduper = FrameDeduper(eps) if eps > 0 else None
        self.retention.begin(vid, color="bgr" if fused else "rgb")

        def chunks():
            for frames, chunk_ts in self.reader.stream_frames(
                    video_path, chunk=settings.STREAM_CHUNK_FRAMES,
                    finish=finish):
                ts.extend(chunk_ts)
                if not fused:
                    if not shape:
                        shape.append(frames.shape[1:3])
                    self.retention.add(vid, frames, chunk_ts)
                if deduper is not None:
                    frames = deduper.filter(frames)
                    if len(frames) == 0:
                        continue
                yield frames

        with trace("phase1.decode_embed"):
            # rebatch: dedup leaves chunks of arbitrary size; coalescing
            # keeps the stream on one compiled bucket shape instead of
            # paying a fresh compile + per-dispatch RTT per odd size
            stream = chunks()
            if deduper is not None:
                stream = rebatch(stream, settings.STREAM_CHUNK_FRAMES)
            emb = self.engine.embed_stream(stream)
        if deduper is not None:
            emb = deduper.scatter(emb)
            if deduper.n_unique < deduper.n_total:
                logger.info(
                    "Scan dedup: embedded %d/%d frames (%.0f%% duplicate)",
                    deduper.n_unique, deduper.n_total,
                    100 * (1 - deduper.n_unique / deduper.n_total))
        if self.cache is not None:
            # put returns the canonical stored values (int8 round trip
            # when enabled) so cold and warm queries score identically
            emb = self.cache.put(vid, emb, ts, tag, shape[0],
                                 self.reader.sample_rate)
        return emb, ts

    # ------------------------------------------------------------------
    def process_video(self, video_path: str, query: str,
                      top_k: Optional[int] = None,
                      threshold: Optional[float] = None,
                      video_id: Optional[str] = None,
                      debug_mode: bool = False):
        top_k = top_k or settings.TOP_K_RESULTS
        threshold = (settings.CONFIDENCE_THRESHOLD if threshold is None
                     else threshold)

        emb, ts = self.frame_embeddings(video_path, video_id)
        n = len(emb)
        mids = window_middle_indices(n, settings.WINDOW_SIZE,
                                     settings.WINDOW_STRIDE)
        wts = window_timestamps(ts, settings.WINDOW_SIZE,
                                settings.WINDOW_STRIDE)
        if len(mids) == 0:
            return ([], {}) if debug_mode else []

        with trace("phase1.score_topk"):
            # one fused dispatch: ids → text tower → scores → window
            # top-k, table padded to FRAME_BUCKETS (compile-bounded);
            # the text embedding lands in the engine's LRU in the same
            # round-trip, so phase-2/3 text consumers hit the cache
            k = min(top_k, len(mids))
            vals, idx = self.engine.query_window_topk(
                query, emb, mids.astype(np.int32), k)

        results = []
        for v, i in zip(vals, idx):
            if np.isfinite(v) and v >= threshold:
                results.append({
                    "timestamp": float(wts[int(i)]),
                    "confidence": float(v),
                    "phase": self.phase_name,
                    "window_index": int(i),
                })
        logger.info("Phase 1: %d/%d windows above threshold %.2f for %r",
                    len(results), len(mids), threshold, query)
        if debug_mode:
            # cache hit: the fused dispatch just stored this query's
            # text embedding in the engine LRU
            q = self.engine.embed_texts(query)[0]
            return results, self._debug_analysis(emb, q, mids, threshold)
        return results

    def process_queries(self, video_path: str, queries: List[str],
                        top_k: Optional[int] = None,
                        threshold: Optional[float] = None,
                        video_id: Optional[str] = None
                        ) -> Dict[str, List[Dict]]:
        """Multi-query scan: ONE embedding table, one [W, Q] score
        matmul — marginal cost per extra query ≈ one text encode.
        (No reference analog; its architecture re-scans per query.)"""
        top_k = top_k or settings.TOP_K_RESULTS
        threshold = (settings.CONFIDENCE_THRESHOLD if threshold is None
                     else threshold)
        emb, ts = self.frame_embeddings(video_path, video_id)
        mids = window_middle_indices(len(emb), settings.WINDOW_SIZE,
                                     settings.WINDOW_STRIDE)
        wts = window_timestamps(ts, settings.WINDOW_SIZE,
                                settings.WINDOW_STRIDE)
        if len(mids) == 0:
            return {q: [] for q in queries}
        q_emb = self.engine.embed_texts(queries)          # [Q, D]
        with trace("phase1.score_topk"):
            k = min(top_k, len(mids))
            demb, dvalid, dmids = self.engine.resident_table(
                emb, mids.astype(np.int32))
            vals, idx = window_topk_multi(
                demb, dvalid, jnp.asarray(q_emb), dmids, k=k)
            vals, idx = np.asarray(vals), np.asarray(idx)
        out: Dict[str, List[Dict]] = {}
        for qi, query in enumerate(queries):
            out[query] = [{
                "timestamp": float(wts[int(i)]),
                "confidence": float(v),
                "phase": self.phase_name,
                "window_index": int(i),
            } for v, i in zip(vals[qi], idx[qi])
                if np.isfinite(v) and v >= threshold]
        return out

    @staticmethod
    def _debug_analysis(emb: np.ndarray, q: np.ndarray, mids: np.ndarray,
                        threshold: float) -> Dict:
        """Similarity statistics + percentile-based threshold
        recommendations (reference ``phase1_mvp.py:165-212`` debug
        panel consumed by the UI)."""
        sims = emb[mids] @ q
        pct = {p: float(np.percentile(sims, p))
               for p in (50, 75, 90, 95, 99)}
        return {
            "similarity_stats": {
                "min": float(sims.min()), "max": float(sims.max()),
                "mean": float(sims.mean()), "std": float(sims.std()),
            },
            "percentiles": pct,
            "windows_above_threshold": int((sims >= threshold).sum()),
            "threshold_recommendations": {
                "strict": pct[95],
                "balanced": pct[90],
                "permissive": pct[75],
            },
        }


def _default_video_id(video_path: str) -> str:
    from pathlib import Path

    return Path(video_path).stem
