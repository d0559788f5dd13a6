"""Phase-1 pipeline + processor facade integration tests (tiny CLIP,
synthetic video, virtual mesh)."""

import numpy as np
import pytest

from tests.conftest import make_test_video


@pytest.fixture()
def tiny_engine(tiny_clip):
    from avede_tpu.models.clip import tiny_test_config
    from avede_tpu.parallel.embed import ClipEngine
    from avede_tpu.parallel.mesh import build_mesh

    model, params = tiny_clip
    return ClipEngine(cfg=tiny_test_config(), params=params,
                      mesh=build_mesh())


class TestPhase1:
    def test_process_video_end_to_end(self, test_video, tiny_engine,
                                      tmp_path):
        from avede_tpu.io.embedding_cache import EmbeddingCache
        from avede_tpu.pipelines.phase1 import Phase1Scan

        scan = Phase1Scan(tiny_engine,
                          cache=EmbeddingCache(str(tmp_path / "emb")))
        results = scan.process_video(test_video, "a white square moving",
                                     top_k=5, threshold=-1.0)
        assert len(results) > 0
        for r in results:
            assert set(r) == {"timestamp", "confidence", "phase",
                              "window_index"}
            assert r["phase"] == "phase1_mvp"
        # sorted by confidence desc
        confs = [r["confidence"] for r in results]
        assert confs == sorted(confs, reverse=True)

    def test_embedding_cache_used_on_second_call(self, test_video,
                                                 tiny_engine, tmp_path):
        from avede_tpu.io.embedding_cache import EmbeddingCache
        from avede_tpu.pipelines.phase1 import Phase1Scan

        cache = EmbeddingCache(str(tmp_path / "emb"))
        scan = Phase1Scan(tiny_engine, cache=cache)
        emb1, ts1 = scan.frame_embeddings(test_video, video_id="v1")
        assert cache.get("v1", scan.cache_tag(), 1) is not None

        # second call must not decode: break the reader to prove it
        scan.reader.extract_frames = None  # type: ignore
        emb2, ts2 = scan.frame_embeddings(test_video, video_id="v1")
        np.testing.assert_allclose(emb1, emb2, atol=1e-6)

    def test_threshold_filters(self, test_video, tiny_engine, tmp_path):
        from avede_tpu.io.embedding_cache import EmbeddingCache
        from avede_tpu.pipelines.phase1 import Phase1Scan

        scan = Phase1Scan(tiny_engine,
                          cache=EmbeddingCache(str(tmp_path / "emb")))
        results = scan.process_video(test_video, "query", threshold=2.0)
        assert results == []


class TestQueryRewrite:
    def test_reference_semantics(self):
        from avede_tpu.services.query_rewrite import preprocess_query

        assert preprocess_query("The man runs") == "man running"
        assert preprocess_query("a pedestrian walks") == "person walking"
        assert preprocess_query("very   dark blue automobile") == "navy car"
        assert preprocess_query("REALLY pretty the dog sits") == "dog sitting"


class TestVideoProcessor:
    @pytest.fixture()
    def processor(self, tiny_engine, tmp_data_dirs):
        from avede_tpu.services.video_processor import VideoProcessor

        return VideoProcessor(engine=tiny_engine)

    def test_process_query_mvp(self, processor, tmp_data_dirs):
        video = make_test_video(tmp_data_dirs / "videos" / "abc123.mp4")
        out = processor.process_query(video, "white square", mode="mvp",
                                      threshold=-1.0, extract_clips=True)
        assert out["status"] == "completed"
        assert out["total_found"] == len(out["results"]) > 0
        assert out["metadata"]["mode"] == "mvp"
        # clips attached and on disk
        import os
        assert all(os.path.exists(r["clip_path"]) for r in out["results"])

    def test_unknown_mode_envelope(self, processor, tmp_data_dirs):
        video = make_test_video(tmp_data_dirs / "videos" / "v2.mp4")
        out = processor.process_query(video, "q", mode="bogus")
        assert out["status"] == "error"
        assert "bogus" in out["error"]

    def test_resolve_video(self, processor, tmp_data_dirs):
        make_test_video(tmp_data_dirs / "videos" / "vidx.mp4")
        assert processor.resolve_video("vidx").endswith("vidx.mp4")
        from avede_tpu.utils.errors import AvedeError

        with pytest.raises(AvedeError):
            processor.resolve_video("missing")

    def test_validate_video(self, processor, tmp_data_dirs):
        video = make_test_video(tmp_data_dirs / "videos" / "v3.mp4")
        info = processor.validate_video(video)
        assert info["valid"] and info["total_frames"] == 75


class TestDebugMode:
    def test_debug_analysis_payload(self, test_video, tiny_engine,
                                    tmp_path):
        from avede_tpu.io.embedding_cache import EmbeddingCache
        from avede_tpu.pipelines.phase1 import Phase1Scan

        scan = Phase1Scan(tiny_engine,
                          cache=EmbeddingCache(str(tmp_path / "emb")))
        results, debug = scan.process_video(
            test_video, "white square", threshold=-1.0, debug_mode=True)
        assert "similarity_stats" in debug
        assert debug["percentiles"][50] <= debug["percentiles"][95]
        recs = debug["threshold_recommendations"]
        assert recs["permissive"] <= recs["balanced"] <= recs["strict"]


class TestTopLevelExports:
    def test_lazy_exports(self):
        import avede_tpu

        assert avede_tpu.VideoProcessor.__name__ == "VideoProcessor"
        assert avede_tpu.settings.WINDOW_SIZE == 16
        with pytest.raises(AttributeError):
            avede_tpu.nonexistent


class TestMultiQuery:
    def test_batch_queries_match_single(self, test_video, tiny_engine,
                                        tmp_path):
        from avede_tpu.io.embedding_cache import EmbeddingCache
        from avede_tpu.pipelines.phase1 import Phase1Scan

        scan = Phase1Scan(tiny_engine,
                          cache=EmbeddingCache(str(tmp_path / "emb")))
        queries = ["white square", "dark frame", "moving object"]
        batch = scan.process_queries(test_video, queries, top_k=4,
                                     threshold=-1.0, video_id="mq")
        assert set(batch) == set(queries)
        for q in queries:
            single = scan.process_video(test_video, q, top_k=4,
                                        threshold=-1.0, video_id="mq")
            assert [r["window_index"] for r in batch[q]] == \
                [r["window_index"] for r in single]
            for a, b in zip(batch[q], single):
                assert abs(a["confidence"] - b["confidence"]) < 1e-5


class TestFusedPack:
    """The fused decode-thread i420 pack (SCAN_FUSED_PACK) must be a
    pure relocation of work: identical embeddings, identical rerank
    candidate pixels, same cache tag as the prefetch-thread pack."""

    def _embeddings(self, video, engine, tmp_path, fused, sub,
                    eps=0.0):
        from avede_tpu.io.embedding_cache import EmbeddingCache
        from avede_tpu.pipelines.phase1 import Phase1Scan
        from avede_tpu.utils.config import settings

        old = settings.SCAN_FUSED_PACK
        old_eps = settings.SCAN_DEDUP_EPS
        settings.SCAN_FUSED_PACK = fused
        settings.SCAN_DEDUP_EPS = eps
        try:
            scan = Phase1Scan(
                engine, cache=EmbeddingCache(str(tmp_path / sub)))
            emb, ts = scan.frame_embeddings(video, video_id=f"v{fused}")
            return scan, emb, ts
        finally:
            settings.SCAN_FUSED_PACK = old
            settings.SCAN_DEDUP_EPS = old_eps

    def test_fused_pack_matches_prefetch_pack(self, test_video,
                                              tiny_engine, tmp_path):
        """Dedup disabled: with the gate off the fused pack must be
        byte-identical work relocation. (With dedup ON the gates
        legitimately differ — fused gates on the packed luma, i.e. on
        exactly what the model sees after the central crop, so frames
        merged there have identical embeddings by construction.)"""
        _, emb_f, ts_f = self._embeddings(test_video, tiny_engine,
                                          tmp_path, True, "a")
        _, emb_u, ts_u = self._embeddings(test_video, tiny_engine,
                                          tmp_path, False, "b")
        assert ts_f == ts_u
        np.testing.assert_array_equal(emb_f, emb_u)

    def test_fused_dedup_scatter_consistent(self, test_video,
                                            tiny_engine, tmp_path):
        """With the gate on, the fused path still yields a full-length
        table aligned with timestamps."""
        _, emb, ts = self._embeddings(test_video, tiny_engine,
                                      tmp_path, True, "e", eps=1.5)
        assert len(emb) == len(ts)
        assert np.isfinite(emb).all()

    def test_retention_serves_rgb_from_bgr_store(self, test_video,
                                                 tiny_engine, tmp_path):
        scan_f, _, ts = self._embeddings(test_video, tiny_engine,
                                         tmp_path, True, "c")
        scan_u, _, _ = self._embeddings(test_video, tiny_engine,
                                        tmp_path, False, "d")
        want = ts[:3]
        got_f = scan_f.retention.lookup("vTrue", want)
        got_u = scan_u.retention.lookup("vFalse", want)
        assert set(got_f) == set(got_u) and got_f
        for k in got_f:
            np.testing.assert_array_equal(got_f[k], got_u[k])

    def test_finish_hook_runs_on_decode_threads(self, test_video):
        import threading

        from avede_tpu.io.video_reader import VideoReader

        seen = []

        def finish(bgr, ts):
            seen.append((threading.current_thread().name,
                         bgr.shape, len(ts)))
            return bgr[:, :8, :8]        # arbitrary transform

        reader = VideoReader(max_frames=32)
        chunks = list(reader.stream_frames(test_video, chunk=8,
                                           finish=finish))
        assert seen and all(n.startswith("avede-decode")
                            for n, _, _ in seen)
        # consumer receives the hook's return value
        assert all(f.shape[1:3] == (8, 8) for f, _ in chunks)

    def test_dedup_luma_signature_gates_static_video(self, tmp_path):
        from avede_tpu.ops.dedup import FrameDeduper, _signatures
        from avede_tpu.ops.preprocess import pack_frames_i420

        rng = np.random.default_rng(0)
        base = rng.integers(0, 255, (64, 96, 3), np.uint8)
        frames = np.stack([base] * 6 + [np.roll(base, 40, axis=1)] * 2)
        packed = pack_frames_i420(frames, 32)
        ded = FrameDeduper(1.5,
                           signature_fn=lambda f: _signatures(f[:, :32]))
        kept = ded.filter(packed)
        assert ded.n_unique == 2 and len(kept) == 2
        assert ded.mapping == [0] * 6 + [1] * 2
