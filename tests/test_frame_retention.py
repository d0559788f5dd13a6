"""Scan-frame retention: the cold advanced path must not decode any
frame twice (phase-1 keeps decoded chunks; phase-2 reranks from them)."""

import numpy as np
import pytest

from avede_tpu.io.frame_retention import FrameRetention, ts_key


class TestFrameRetention:
    def test_lookup_roundtrip(self):
        r = FrameRetention(budget_mb=64)
        r.begin("vid")
        frames = np.arange(2 * 4 * 4 * 3, dtype=np.uint8).reshape(
            2, 4, 4, 3)
        r.add("vid", frames, [0.0, 0.5])
        hit = r.lookup("vid", [0.5, 0.0, 1.0])
        assert set(hit) == {ts_key(0.5), ts_key(0.0)}
        np.testing.assert_array_equal(hit[ts_key(0.5)], frames[1])

    def test_cross_frame_ms_key_collision_poisons(self):
        """Two DIFFERENT timestamps quantizing to one ms key are
        different frames — the key must go dark (lookup miss → decode
        fallback), not serve whichever frame was retained last. The
        per-request duplicate check in ``_embed_rows_from_retention``
        can't see this case when only one of the colliding rows is
        requested (round-5 review finding)."""
        r = FrameRetention(budget_mb=64)
        r.begin("vid")
        a = np.full((1, 4, 4, 3), 10, np.uint8)
        b = np.full((1, 4, 4, 3), 200, np.uint8)
        t0, t1 = 0.9996, 1.0004
        assert ts_key(t0) == ts_key(t1)
        r.add("vid", a, [t0])
        r.add("vid", b, [t1])       # collides with a's key
        assert r.lookup("vid", [t0]) == {}
        assert r.lookup("vid", [t1]) == {}
        # a later frame re-using the poisoned key stays dark too
        r.add("vid", a, [t0])
        assert r.lookup("vid", [t0]) == {}
        # equal timestamps (duplicated pts) are the same frame: fine
        r2 = FrameRetention(budget_mb=64)
        r2.begin("vid")
        r2.add("vid", a, [t0])
        r2.add("vid", a, [t0])
        hit = r2.lookup("vid", [t0])
        np.testing.assert_array_equal(hit[ts_key(t0)], a[0])

    def test_other_video_misses(self):
        r = FrameRetention(budget_mb=64)
        r.begin("a")
        r.add("a", np.zeros((1, 2, 2, 3), np.uint8), [0.0])
        assert r.lookup("b", [0.0]) == {}
        r.begin("b")   # evicts a
        assert r.lookup("a", [0.0]) == {}

    def test_budget_zero_disables(self):
        r = FrameRetention(budget_mb=0)
        r.begin("vid")
        r.add("vid", np.zeros((1, 2, 2, 3), np.uint8), [0.0])
        assert r.lookup("vid", [0.0]) == {}
        assert r.retained_bytes == 0

    def test_over_budget_drops_whole_video(self):
        r = FrameRetention(budget_mb=1)
        r.begin("vid")
        small = np.zeros((1, 8, 8, 3), np.uint8)
        r.add("vid", small, [0.0])
        big = np.zeros((4, 512, 512, 3), np.uint8)   # 3 MB > 1 MB cap
        r.add("vid", big, [1.0, 2.0, 3.0, 4.0])
        assert r.lookup("vid", [0.0, 1.0]) == {}
        assert r.retained_bytes == 0
        # later adds stay disabled for this video
        r.add("vid", small, [9.0])
        assert r.lookup("vid", [9.0]) == {}

    def test_mismatched_lengths_raise(self):
        r = FrameRetention(budget_mb=4)
        r.begin("vid")
        with pytest.raises(ValueError):
            r.add("vid", np.zeros((2, 2, 2, 3), np.uint8), [0.0])


class TestPhase2UsesRetention:
    @pytest.fixture()
    def stack(self, tiny_clip, tmp_path):
        from avede_tpu.io.embedding_cache import EmbeddingCache
        from avede_tpu.models.blip import init_blip, tiny_blip_config
        from avede_tpu.models.clip import tiny_test_config
        from avede_tpu.parallel.embed import ClipEngine
        from avede_tpu.parallel.mesh import build_mesh
        from avede_tpu.pipelines.phase1 import Phase1Scan
        from avede_tpu.pipelines.phase2 import Phase2Rerank
        from avede_tpu.services.captioner import CaptionService

        model, params = tiny_clip
        engine = ClipEngine(cfg=tiny_test_config(), params=params,
                            mesh=build_mesh())
        p1 = Phase1Scan(engine,
                        cache=EmbeddingCache(str(tmp_path / "emb")))
        bcfg = tiny_blip_config()
        bmodel, bparams = init_blip(bcfg, seed=0)
        cap = CaptionService(engine, cfg=bcfg, params=bparams)
        return p1, Phase2Rerank(p1, captioner=cap)

    def test_cold_rerank_reads_no_frames(self, stack, test_video):
        """Cold scan → rerank within one request: candidate frames come
        from retention, the video file is opened exactly once (by the
        scan's streaming decode)."""
        p1, p2 = stack
        calls = {"n": 0}
        orig = p1.reader.read_frames_at

        def counting(path, ts, return_ok=False):
            calls["n"] += 1
            return orig(path, ts, return_ok=return_ok)

        p1.reader.read_frames_at = counting
        out = p2.process_video(test_video, "white square", top_k=4,
                               threshold=-1.0, video_id="coldret")
        assert out
        assert calls["n"] == 0
        assert p1.retention.retained_bytes > 0

    def test_retention_matches_reread(self, stack, test_video):
        """Retained frames must equal what a container re-read returns
        (same index mapping) so rerank scores are identical either way."""
        p1, p2 = stack
        emb, ts = p1.frame_embeddings(test_video, video_id="eqret")
        pick = [ts[0], ts[len(ts) // 2], ts[-1]]
        retained = p1.retention.lookup("eqret", pick)
        assert len(retained) == len(pick)
        from avede_tpu.io.frame_retention import ts_key

        reread = p1.reader.read_frames_at(test_video, pick)
        for i, t in enumerate(pick):
            np.testing.assert_array_equal(retained[ts_key(t)], reread[i])

    def test_retention_disabled_falls_back(self, stack, test_video,
                                           monkeypatch):
        from avede_tpu.utils.config import settings

        p1, p2 = stack
        monkeypatch.setattr(settings, "FRAME_RETAIN_MB", 0)
        calls = {"n": 0}
        orig = p1.reader.read_frames_at

        def counting(path, ts, return_ok=False):
            calls["n"] += 1
            return orig(path, ts, return_ok=return_ok)

        p1.reader.read_frames_at = counting
        out = p2.process_video(test_video, "white square", top_k=4,
                               threshold=-1.0, video_id="noret")
        assert out
        assert calls["n"] == 1   # fell back to the container re-read
