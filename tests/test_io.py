"""I/O layer tests: video reader, clip writer, embedding cache."""

import numpy as np
import pytest

from tests.conftest import make_test_video


class TestVideoReader:
    def test_extract_frames_shapes_and_timestamps(self, test_video):
        from avede_tpu.io.video_reader import VideoReader

        frames, ts = VideoReader().extract_frames(test_video)
        assert frames.dtype == np.uint8
        assert frames.ndim == 4 and frames.shape[-1] == 3
        assert len(frames) == len(ts) == 75
        assert ts[0] == 0.0
        assert abs(ts[1] - 1 / 25.0) < 1e-6

    def test_sample_rate_override(self, test_video):
        from avede_tpu.io.video_reader import VideoReader

        frames, ts = VideoReader().extract_frames(test_video, sample_rate=5)
        assert len(frames) == 15

    def test_max_frames_redistribution(self):
        from avede_tpu.io.video_reader import sample_indices

        idxs = sample_indices(5000, 1, 1000)
        assert len(idxs) == 1000
        assert idxs[0] == 0
        # even spread covering the WHOLE video (near-constant step)
        assert idxs[-1] == 4999
        steps = set(np.diff(idxs))
        assert steps <= {4, 5, 6}

    def test_validate_video_rejects_bad_format(self, tmp_path):
        from avede_tpu.io.video_reader import validate_video
        from avede_tpu.utils.errors import VideoValidationError

        bad = tmp_path / "x.txt"
        bad.write_text("nope")
        with pytest.raises(VideoValidationError):
            validate_video(str(bad))

    def test_validate_missing(self):
        from avede_tpu.io.video_reader import validate_video
        from avede_tpu.utils.errors import VideoValidationError

        with pytest.raises(VideoValidationError):
            validate_video("/does/not/exist.mp4")

    def test_read_frame_at(self, test_video):
        from avede_tpu.io.video_reader import VideoReader

        f = VideoReader().read_frame_at(test_video, 1.0)
        assert f.dtype == np.uint8 and f.shape[-1] == 3

    def test_stream_frames_matches_extract(self, test_video):
        """Chunked streaming decode must be byte-identical to the
        whole-video extract (same sampling, order, timestamps)."""
        from avede_tpu.io.video_reader import VideoReader

        r = VideoReader()
        ref_frames, ref_ts = r.extract_frames(test_video)
        chunks = list(r.stream_frames(test_video, chunk=16, workers=1))
        frames = np.concatenate([c for c, _ in chunks])
        ts = [t for _, cts in chunks for t in cts]
        assert ts == ref_ts
        np.testing.assert_array_equal(frames, ref_frames)
        assert all(len(c) <= 16 for c, _ in chunks)

    def test_stream_batches_exact_sizes(self, test_video):
        """``stream_batches`` coalesces the per-span flush remainders:
        every yield except the last is exactly ``batch`` frames, and the
        concatenation is byte-identical to the whole-video extract."""
        from avede_tpu.io.video_reader import VideoReader

        r = VideoReader()
        ref_frames, ref_ts = r.extract_frames(test_video)
        batches = list(r.stream_batches(test_video, 7))
        sizes = [len(f) for f, _ in batches]
        assert all(s == 7 for s in sizes[:-1]) and 0 < sizes[-1] <= 7
        frames = np.concatenate([f for f, _ in batches])
        ts = [t for _, bts in batches for t in bts]
        assert ts == ref_ts
        np.testing.assert_array_equal(frames, ref_frames)
        for f, bts in batches:
            assert len(f) == len(bts)

    def test_expected_sample_count(self, test_video):
        from avede_tpu.io.video_reader import VideoReader

        r = VideoReader()
        _, ts = r.extract_frames(test_video)
        assert r.expected_sample_count(test_video) == len(ts)
        assert r.expected_sample_count(test_video, sample_rate=5) == \
            len(r.extract_frames(test_video, sample_rate=5)[1])

    @pytest.mark.parametrize("sample_rate", [1, 7])
    def test_parallel_decode_identical(self, test_video, sample_rate):
        """Multi-worker segment decode (dense scan AND sparse seek
        paths) must reproduce single-worker output exactly."""
        from avede_tpu.io.video_reader import VideoReader

        r = VideoReader()
        one = list(r.stream_frames(test_video, chunk=8,
                                   sample_rate=sample_rate, workers=1))
        par = list(r.stream_frames(test_video, chunk=8,
                                   sample_rate=sample_rate, workers=3))
        f1 = np.concatenate([c for c, _ in one])
        f3 = np.concatenate([c for c, _ in par])
        t1 = [t for _, ts in one for t in ts]
        t3 = [t for _, ts in par for t in ts]
        assert t1 == t3
        np.testing.assert_array_equal(f1, f3)


class TestClipWriter:
    def test_extract_clip_dict_contract(self, test_video, tmp_path):
        from avede_tpu.io.clip_writer import ClipWriter

        w = ClipWriter(clip_dir=str(tmp_path / "clips"))
        out = w.extract_clip(test_video, 0.5, 2.0)
        assert set(out) >= {"clip_path", "clip_filename", "start_time",
                            "end_time", "duration"}
        assert out["start_time"] == 0.5
        import os
        assert os.path.getsize(out["clip_path"]) > 0

    def test_clamping_to_duration(self, test_video, tmp_path):
        from avede_tpu.io.clip_writer import ClipWriter

        w = ClipWriter(clip_dir=str(tmp_path / "clips"))
        out = w.extract_clip(test_video, -5.0, 9999.0)
        assert out["start_time"] == 0.0
        assert out["end_time"] <= 3.01  # 75 frames @25fps = 3s

    def test_padding_centers_window(self, test_video, tmp_path):
        from avede_tpu.io.clip_writer import ClipWriter

        w = ClipWriter(clip_dir=str(tmp_path / "clips"))
        out = w.extract_clip_with_padding(test_video, 1.5, duration=2.0)
        assert abs(out["start_time"] - 0.5) < 1e-6
        assert abs(out["end_time"] - 2.5) < 1e-6


class TestEmbeddingCache:
    def test_roundtrip_float32(self, tmp_path, monkeypatch):
        from avede_tpu.io.embedding_cache import EmbeddingCache
        from avede_tpu.utils.config import settings

        monkeypatch.setattr(settings, "EMBEDDING_CACHE_INT8", False)
        c = EmbeddingCache(str(tmp_path))
        emb = np.random.default_rng(0).normal(size=(10, 8)).astype(np.float32)
        ts = [float(i) for i in range(10)]
        c.put("vid1", emb, ts, "clip:test", (64, 96), 1)
        got = c.get("vid1", "clip:test", 1)
        assert got is not None
        np.testing.assert_array_equal(got[0], emb)
        assert got[1] == ts

    def test_int8_roundtrip_preserves_cosine(self, tmp_path, monkeypatch):
        """Default int8 entries: ≲1e-3 cosine drift, ~4× smaller raw
        payload, retrieval ORDER preserved."""
        from avede_tpu.io.embedding_cache import EmbeddingCache
        from avede_tpu.utils.config import settings

        monkeypatch.setattr(settings, "EMBEDDING_CACHE_INT8", True)
        c = EmbeddingCache(str(tmp_path))
        rng = np.random.default_rng(1)
        emb = rng.normal(size=(50, 64)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        c.put("v", emb, [float(i) for i in range(50)], "t", (64, 96), 1)
        got, _ = c.get("v", "t", 1)
        cos = (got * emb).sum(1) / (
            np.linalg.norm(got, axis=1) * np.linalg.norm(emb, axis=1))
        assert np.all(cos > 1 - 1e-3), 1 - cos.min()
        q = rng.normal(size=(64,)).astype(np.float32)
        assert np.argmax(emb @ q) == np.argmax(got @ q)

    def test_memory_tier(self, tmp_path, monkeypatch):
        """Warm get() is served from RAM (no disk read), capacity
        evicts by bytes, put/invalidate drop stale entries."""
        from avede_tpu.io.embedding_cache import EmbeddingCache
        from avede_tpu.utils.config import settings

        c = EmbeddingCache(str(tmp_path))
        emb = np.ones((4, 8), np.float32)
        c.put("v", emb, [0.] * 4, "t", (64, 96), 1)
        # delete the file: a mem hit must still serve it
        c._path("v").unlink()
        got = c.get("v", "t", 1)
        assert got is not None and got[0].shape == (4, 8)
        # stale-tag lookups miss (and the file is gone)
        assert c.get("v", "OTHER", 1) is None
        # re-put under a new tag drops the old mem entry
        c.put("v", emb, [0.] * 4, "t2", (64, 96), 1)
        assert c.get("v", "t", 1) is None
        assert c.get("v", "t2", 1) is not None
        # invalidate drops both tiers
        c.invalidate("v")
        assert c.get("v", "t2", 1) is None
        # capacity bound: entries bigger than the cap are not admitted
        monkeypatch.setattr(settings, "EMBEDDING_MEM_CACHE_MB", 0)
        c.put("w", emb, [0.] * 4, "t", (64, 96), 1)
        assert len(c._mem) == 0
        assert c.get("w", "t", 1) is not None      # disk still works

    def test_int8_and_f32_entries_coexist(self, tmp_path, monkeypatch):
        from avede_tpu.io.embedding_cache import EmbeddingCache
        from avede_tpu.utils.config import settings

        c = EmbeddingCache(str(tmp_path))
        emb = np.ones((3, 4), np.float32)
        monkeypatch.setattr(settings, "EMBEDDING_CACHE_INT8", False)
        c.put("f32", emb, [0., 1., 2.], "t", (64, 96), 1)
        monkeypatch.setattr(settings, "EMBEDDING_CACHE_INT8", True)
        c.put("i8", emb, [0., 1., 2.], "t", (64, 96), 1)
        for vid in ("f32", "i8"):
            got = c.get(vid, "t", 1)
            assert got is not None
            np.testing.assert_allclose(got[0], emb, atol=1e-2)

    def test_model_tag_mismatch_invalidates(self, tmp_path):
        from avede_tpu.io.embedding_cache import EmbeddingCache

        c = EmbeddingCache(str(tmp_path))
        c.put("vid1", np.zeros((2, 4), np.float32), [0.0, 1.0],
              "clip:a", (64, 96), 1)
        assert c.get("vid1", "clip:b", 1) is None
        assert c.get("vid1", "clip:a", 2) is None
        assert c.get("vid1", "clip:a", 1) is not None

    def test_missing(self, tmp_path):
        from avede_tpu.io.embedding_cache import EmbeddingCache

        assert EmbeddingCache(str(tmp_path)).get("nope", "t", 1) is None


class TestLongVideo:
    def test_frame_cap_redistribution_end_to_end(self, tmp_path):
        """1200-frame video → capped to MAX_FRAMES with even spread
        (reference frame_extractor.py:66-77 semantics at scale)."""
        from tests.conftest import make_test_video

        from avede_tpu.io.video_reader import VideoReader

        video = make_test_video(tmp_path / "long.mp4", n_frames=1200,
                                fps=30.0, size=(64, 48))
        frames, ts = VideoReader().extract_frames(video)
        assert len(frames) == 1000
        # even spread: timestamps span the whole video
        assert ts[0] == 0.0
        assert ts[-1] > 1150 / 30.0 * 0.95
        steps = np.diff([t * 30.0 for t in ts])
        assert steps.std() < 1.0  # near-constant stride


class TestFrameReprCache:
    def test_roundtrip_across_instances(self, tmp_path):
        """Disk tier: a fresh instance (process restart) sees cached
        reprs; a tag change discards them."""
        from avede_tpu.io.embedding_cache import FrameReprCache

        c1 = FrameReprCache("blipcap", cache_dir=str(tmp_path))
        reprs = {c1.key(1.5): np.str_("a white square"),
                 c1.key(3.0): np.str_("a dark frame")}
        c1.put_many("vid", "tagA", reprs)

        c2 = FrameReprCache("blipcap", cache_dir=str(tmp_path))
        hit = c2.get_many("vid", "tagA", [1.5, 3.0, 9.9])
        assert set(hit) == {c2.key(1.5), c2.key(3.0)}
        assert str(hit[c2.key(1.5)]) == "a white square"

        c3 = FrameReprCache("blipcap", cache_dir=str(tmp_path))
        assert c3.get_many("vid", "tagB", [1.5]) == {}

    def test_array_reprs(self, tmp_path):
        """BLIP-2 image-feature arrays round-trip (no pickle)."""
        from avede_tpu.io.embedding_cache import FrameReprCache

        c = FrameReprCache("blip2img", cache_dir=str(tmp_path))
        arr = np.random.default_rng(0).normal(size=(4, 24)).astype(
            np.float32)
        c.put_many("v", "t", {c.key(2.0): arr})
        c2 = FrameReprCache("blip2img", cache_dir=str(tmp_path))
        got = c2.get_many("v", "t", [2.0])[c2.key(2.0)]
        np.testing.assert_array_equal(got, arr)

    def test_mem_tier_respects_tag(self, tmp_path):
        """Tag change must invalidate the MEMORY tier too — serving
        tagA entries for a tagB request (and persisting the mix) was
        the in-process stale-model bug."""
        from avede_tpu.io.embedding_cache import FrameReprCache

        c = FrameReprCache("blipcap", cache_dir=str(tmp_path))
        c.put_many("v", "tagA", {c.key(1.0): np.str_("old caption")})
        assert c.get_many("v", "tagA", [1.0])  # mem hit
        # same instance, new tag: must NOT serve the tagA entry
        assert c.get_many("v", "tagB", [1.0]) == {}
        c.put_many("v", "tagB", {c.key(2.0): np.str_("new caption")})
        # the tagB file contains only tagB entries
        c2 = FrameReprCache("blipcap", cache_dir=str(tmp_path))
        assert set(c2.get_many("v", "tagB", [1.0, 2.0])) == {c2.key(2.0)}

    def test_memory_only_mode_writes_nothing(self, tmp_path):
        """persist=False (embedding cache disabled) keeps reprs in
        memory only — disabling caching must not keep writing rerank
        reprs to disk."""
        from avede_tpu.io.embedding_cache import FrameReprCache

        c = FrameReprCache("blipcap", cache_dir=str(tmp_path),
                           persist=False)
        c.put_many("v", "t", {c.key(1.0): np.str_("cap")})
        assert list(tmp_path.iterdir()) == []          # nothing on disk
        assert c.get_many("v", "t", [1.0])             # mem tier serves
        c2 = FrameReprCache("blipcap", cache_dir=str(tmp_path),
                            persist=False)
        assert c2.get_many("v", "t", [1.0]) == {}      # not shared
        c.invalidate("v")
        assert c.get_many("v", "t", [1.0]) == {}

    def test_zero_mem_budget_disables_tier(self, tmp_path, monkeypatch):
        """EMBEDDING_MEM_CACHE_MB=0 disables the memory tier entirely
        (the EmbeddingCache convention) — it used to keep one video
        resident regardless."""
        from avede_tpu.io.embedding_cache import FrameReprCache
        from avede_tpu.utils.config import settings

        monkeypatch.setattr(settings, "EMBEDDING_MEM_CACHE_MB", 0)
        c = FrameReprCache("blipcap", cache_dir=str(tmp_path))
        c.put_many("v", "t", {c.key(1.0): np.str_("cap")})
        assert c._mem == {} and c._mem_bytes == 0
        # disk tier still round-trips
        assert str(c.get_many("v", "t", [1.0])[c.key(1.0)]) == "cap"
        assert c._mem == {}

    def test_phase2_repr_cache_gating(self, monkeypatch):
        """Phase2 must not build a disk-backed repr cache when the
        embedding cache is disabled (phase1.cache is None)."""
        from avede_tpu.pipelines.phase1 import Phase1Scan
        from avede_tpu.pipelines.phase2 import Phase2Rerank
        from avede_tpu.utils.config import settings

        monkeypatch.setattr(settings, "EMBEDDING_CACHE_ENABLED", False)
        scan = Phase1Scan(object())               # engine never touched
        assert scan.cache is None
        p2 = Phase2Rerank(scan)

        class FakeCap:
            repr_kind = "blipcap"
            repr_tag = "t"

            def frame_repr(self, frames):
                return [np.str_("x")] * len(frames)

        p2._captioner = FakeCap()

        class FakeReader:
            def read_frames_at(self, path, ts, return_ok=False):
                frames = np.zeros((len(ts), 8, 8, 3), np.uint8)
                return (frames, [True] * len(ts)) if return_ok \
                    else frames

        scan.reader = FakeReader()
        p2._reprs("fake.mp4", "vid", [1.0, 2.0])
        assert p2._repr_cache is not None
        assert p2._repr_cache.persist is False
