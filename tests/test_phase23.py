"""Phase 2 (caption rerank) and phase 3 (temporal grounding) tests with
tiny models over a synthetic video."""

import numpy as np
import pytest

from tests.conftest import make_test_video


@pytest.fixture()
def tiny_stack(tiny_clip, tmp_path):
    """phase1+2+3 wired with tiny CLIP, tiny BLIP, tiny grounding head."""
    from avede_tpu.io.embedding_cache import EmbeddingCache
    from avede_tpu.models.blip import init_blip, tiny_blip_config
    from avede_tpu.models.clip import tiny_test_config
    from avede_tpu.models.univtg import tiny_grounding_config
    from avede_tpu.parallel.embed import ClipEngine
    from avede_tpu.parallel.mesh import build_mesh
    from avede_tpu.pipelines.phase1 import Phase1Scan
    from avede_tpu.pipelines.phase2 import Phase2Rerank
    from avede_tpu.pipelines.phase3 import Phase3Temporal
    from avede_tpu.services.captioner import CaptionService

    model, params = tiny_clip
    engine = ClipEngine(cfg=tiny_test_config(), params=params,
                        mesh=build_mesh())
    p1 = Phase1Scan(engine, cache=EmbeddingCache(str(tmp_path / "emb")))
    bcfg = tiny_blip_config()
    bmodel, bparams = init_blip(bcfg, seed=0)
    cap = CaptionService(engine, cfg=bcfg, params=bparams)
    p2 = Phase2Rerank(p1, captioner=cap)
    p3 = Phase3Temporal(p2, cfg=tiny_grounding_config(
        input_dim=engine.cfg.projection_dim))
    return p1, p2, p3


class TestPhase2:
    def test_rerank_end_to_end(self, tiny_stack, test_video):
        p1, p2, p3 = tiny_stack
        out = p2.process_video(test_video, "white square", top_k=4,
                               threshold=-1.0)
        assert 0 < len(out) <= 4
        for r in out:
            assert r["phase"] == "phase2_reranked"
            assert "caption" in r and isinstance(r["caption"], str)
            assert "caption_similarity" in r and "clip_score" in r
            expected = 0.7 * r["clip_score"] + 0.3 * r["caption_similarity"]
            assert abs(r["confidence"] - expected) < 1e-5
        confs = [r["confidence"] for r in out]
        assert confs == sorted(confs, reverse=True)

    def test_warm_rerank_reads_no_frames(self, tiny_stack, test_video):
        """Second rerank of the same video must touch neither the video
        file nor BLIP: captions come from the per-frame repr cache."""
        p1, p2, p3 = tiny_stack
        first = p2.process_video(test_video, "white square", top_k=4,
                                 threshold=-1.0, video_id="warmtest")
        assert first
        reads = {"n": 0}
        orig = p1.reader.read_frames_at

        def counting(path, ts):
            reads["n"] += 1
            return orig(path, ts)

        p1.reader.read_frames_at = counting
        caps = {"n": 0}
        orig_repr = p2.captioner.frame_repr

        def counting_repr(frames):
            caps["n"] += 1
            return orig_repr(frames)

        p2.captioner.frame_repr = counting_repr
        second = p2.process_video(test_video, "white square", top_k=4,
                                  threshold=-1.0, video_id="warmtest")
        assert reads["n"] == 0 and caps["n"] == 0
        assert [r["timestamp"] for r in second] == \
               [r["timestamp"] for r in first]
        np.testing.assert_allclose(
            [r["confidence"] for r in second],
            [r["confidence"] for r in first], atol=1e-6)

    def test_repr_cache_tag_invalidates(self, tiny_stack, test_video,
                                        monkeypatch):
        """A caption-model knob change (beams) changes the repr tag and
        discards stale cached captions."""
        from avede_tpu.utils.config import settings

        p1, p2, p3 = tiny_stack
        p2.process_video(test_video, "white square", top_k=3,
                         threshold=-1.0, video_id="tagtest")
        tag_before = p2.captioner.repr_tag
        monkeypatch.setattr(settings, "CAPTION_NUM_BEAMS", 3)
        assert p2.captioner.repr_tag != tag_before
        out = p2.process_video(test_video, "white square", top_k=3,
                               threshold=-1.0, video_id="tagtest")
        assert out  # recomputed under the new tag without error

    def test_caption_batching(self, tiny_stack):
        p1, p2, p3 = tiny_stack
        frames = np.random.default_rng(0).integers(
            0, 255, (3, 48, 64, 3), dtype=np.uint8)
        caps = p2.captioner.caption_frames(frames)
        assert len(caps) == 3
        assert all(isinstance(c, str) and c for c in caps)
        # deterministic
        assert caps == p2.captioner.caption_frames(frames)


class TestPhase3:
    def test_grounding_end_to_end(self, tiny_stack, test_video):
        p1, p2, p3 = tiny_stack
        out = p3.process_video(test_video, "white square", top_k=3,
                               threshold=-1.0)
        assert len(out) > 0
        for r in out:
            assert r["phase"] == "phase3_univtg"
            assert r["start_time"] <= r["timestamp"] <= r["end_time"] + 1e-6
            assert r["duration"] > 0
            assert r["refinement_method"] == "grounding_head"
            assert 0.0 <= r["saliency"] <= 1.0

    def test_direct_grounding(self, tiny_stack, test_video):
        p1, p2, p3 = tiny_stack
        segs = p3.ground_query(test_video, "square", top_k=3)
        assert 0 < len(segs) <= 3
        assert all(s["end_time"] > s["start_time"] for s in segs)

    def test_temporal_consistency_suppression(self):
        from avede_tpu.pipelines.phase3 import temporal_consistency

        results = [
            {"timestamp": 5.0, "start_time": 4.0, "end_time": 8.0,
             "confidence": 0.9},
            {"timestamp": 6.0, "start_time": 5.0, "end_time": 8.5,
             "confidence": 0.5},   # >50% overlap with first → dropped
            {"timestamp": 20.0, "start_time": 19.0, "end_time": 22.0,
             "confidence": 0.4},   # disjoint → kept
        ]
        out = temporal_consistency(results)
        assert len(out) == 2
        assert {r["timestamp"] for r in out} == {5.0, 20.0}

    def test_higher_confidence_replaces(self):
        from avede_tpu.pipelines.phase3 import temporal_consistency

        results = [
            {"timestamp": 5.0, "start_time": 4.0, "end_time": 8.0,
             "confidence": 0.3},
            {"timestamp": 6.0, "start_time": 4.5, "end_time": 8.0,
             "confidence": 0.9},
        ]
        out = temporal_consistency(results)
        assert len(out) == 1 and out[0]["confidence"] == 0.9


class TestAdvancedModeWiring:
    def test_facade_advanced_reaches_phase3(self, tiny_stack, test_video,
                                            tmp_data_dirs):
        """Reference bug §2.6.10: 'advanced' silently ran phase2. Here it
        must produce phase3 results."""
        from avede_tpu.services.video_processor import VideoProcessor

        p1, p2, p3 = tiny_stack
        proc = VideoProcessor(engine=p1.engine)
        proc.phase1 = p1
        proc._phase2 = p2
        proc._phase3 = p3
        out = proc.process_query(test_video, "white square",
                                 mode="advanced", threshold=-1.0,
                                 extract_clips=False)
        assert out["status"] == "completed"
        assert all(r["phase"] == "phase3_univtg" for r in out["results"])


class TestGroundingLongVideo:
    def test_forward_past_positional_table(self, tiny_stack):
        """Videos longer than the head's max_frames (tiny config: 128)
        must ground every frame via windowing — the pre-fix path
        truncated to 128 and indexed out of range."""
        p1, p2, p3 = tiny_stack
        rng = np.random.default_rng(0)
        n = 200   # > tiny max_frames=128
        emb = rng.normal(size=(n, p1.engine.cfg.projection_dim))
        emb = (emb / np.linalg.norm(emb, axis=1, keepdims=True)
               ).astype(np.float32)
        text = emb[0]
        sal, off = p3._forward(emb, text)
        assert sal.shape == (n,)
        assert off.shape == (n, 2)
        assert np.isfinite(sal).all()

    def test_refine_long_video_candidates(self, tiny_stack):
        """End-of-video candidates (index > max_frames) refine without
        error and carry sane boundaries."""
        p1, p2, p3 = tiny_stack
        rng = np.random.default_rng(1)
        n = 160
        emb = rng.normal(size=(n, p1.engine.cfg.projection_dim)
                         ).astype(np.float32)
        ts = [float(i) for i in range(n)]
        orig = p1.frame_embeddings
        p1.frame_embeddings = lambda *a, **k: (emb, ts)
        try:
            cands = [{"timestamp": 150.0, "confidence": 0.9},
                     {"timestamp": 5.0, "confidence": 0.8}]
            out = p3.refine_candidates("fake.mp4", "q", cands,
                                       video_id="long")
        finally:
            p1.frame_embeddings = orig
        assert len(out) == 2
        for r in out:
            assert r["start_time"] <= r["timestamp"] <= r["end_time"] + 1e-6
            assert 0.0 <= r["saliency"] <= 1.0

    def test_bucketed_compiles(self, tiny_stack):
        """Nearby frame counts share one power-of-two padded program."""
        p1, p2, p3 = tiny_stack
        rng = np.random.default_rng(2)
        d = p1.engine.cfg.projection_dim
        text = rng.normal(size=(d,)).astype(np.float32)
        for n in (33, 40, 57, 64):   # all pad to the 64 bucket
            p3._forward(rng.normal(size=(n, d)).astype(np.float32), text)
        assert p3._fwd._cache_size() == 1

    def test_window_count_bucketed_compiles(self, tiny_stack):
        """Past max_frames the WINDOW count pads to power-of-two
        buckets too: one program serves every video length class in
        the bucket instead of one compile per distinct window count
        (round-3 advisor)."""
        p1, p2, p3 = tiny_stack
        rng = np.random.default_rng(3)
        d = p1.engine.cfg.projection_dim
        text = rng.normal(size=(d,)).astype(np.float32)
        cap = p3.cfg.max_frames
        # window counts 3, 4, 4 → all pad to the 4-window bucket
        for n in (cap * 3, cap * 3 + cap // 2, cap * 4):
            sal, _ = p3._forward(
                rng.normal(size=(n, d)).astype(np.float32), text)
            assert sal.shape == (n,) and np.isfinite(sal).all()
        assert p3._fwd._cache_size() == 1


def test_rerank_and_ground_spans_recorded(tiny_stack, test_video):
    """The advanced path's phase-2 and phase-3 stages appear in the
    metrics monitor alongside phase-1's spans (/api/metrics surface)."""
    from avede_tpu.utils.metrics import get_monitor

    p1, p2, p3 = tiny_stack
    p3.process_video(test_video, "white square", top_k=3,
                     threshold=-1.0, video_id="spantest")
    ops = get_monitor().summary()["operations"]
    assert "phase2.rerank" in ops
    assert "phase3.ground" in ops
