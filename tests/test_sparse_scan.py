"""Sparse cold scan (SCAN_SPARSE_COLD): phase-1 embeds only window-
middle rows on the cold path; full-table consumers complete the sparse
cache entry lazily from retention (or one streaming re-decode).

Invariants proven here:
- phase-1 results are IDENTICAL to the dense scan (scoring only ever
  reads middle rows — ops/windows.py);
- the sparse entry is invisible to ``EmbeddingCache.get`` (complete
  tables only) but served by ``get_entry``;
- ``frame_embeddings(rows="full")`` completes the table to the dense
  scan's values (retention path AND decode-fallback path);
- broken container metadata (expected count ≠ decoded count) still
  yields a table valid at every actual window middle.
"""

import numpy as np
import pytest

from avede_tpu.utils.config import settings


@pytest.fixture()
def tiny_engine(tiny_clip):
    from avede_tpu.models.clip import tiny_test_config
    from avede_tpu.parallel.embed import ClipEngine
    from avede_tpu.parallel.mesh import build_mesh

    model, params = tiny_clip
    return ClipEngine(cfg=tiny_test_config(), params=params,
                      mesh=build_mesh())


def _scan(tiny_engine, tmp_path, name):
    from avede_tpu.io.embedding_cache import EmbeddingCache
    from avede_tpu.pipelines.phase1 import Phase1Scan

    return Phase1Scan(tiny_engine,
                      cache=EmbeddingCache(str(tmp_path / name)))


class TestSparseScan:
    def test_results_match_dense(self, test_video, tiny_engine, tmp_path,
                                 monkeypatch):
        from avede_tpu.pipelines.phase1 import Phase1Scan

        monkeypatch.setattr(settings, "SCAN_DEDUP_EPS", 0.0)
        monkeypatch.setattr(settings, "SCAN_SPARSE_COLD", False)
        dense = _scan(tiny_engine, tmp_path, "d").process_video(
            test_video, "a white square", top_k=5, threshold=-1.0)
        monkeypatch.setattr(settings, "SCAN_SPARSE_COLD", True)
        sparse = _scan(tiny_engine, tmp_path, "s").process_video(
            test_video, "a white square", top_k=5, threshold=-1.0)
        assert len(sparse) == len(dense) > 0
        for a, b in zip(sparse, dense):
            assert a["window_index"] == b["window_index"]
            assert a["timestamp"] == b["timestamp"]
            np.testing.assert_allclose(a["confidence"], b["confidence"],
                                       atol=1e-6)
        # dense table also exists for comparison below
        Phase1Scan  # silence linters

    def test_cache_entry_sparse_then_completed(self, test_video,
                                               tiny_engine, tmp_path,
                                               monkeypatch):
        monkeypatch.setattr(settings, "SCAN_DEDUP_EPS", 0.0)
        monkeypatch.setattr(settings, "SCAN_SPARSE_COLD", True)
        scan = _scan(tiny_engine, tmp_path, "c")
        emb_s, ts = scan.frame_embeddings(test_video, video_id="v",
                                          rows="scan")
        tag = scan.cache_tag()
        # complete-table view must NOT see the sparse entry
        assert scan.cache.get("v", tag, scan.reader.sample_rate) is None
        ent = scan.cache.get_entry("v", tag, scan.reader.sample_rate)
        assert ent is not None and ent[2] is not None
        valid = ent[2]
        assert 0 < valid.sum() < len(valid)
        # unfilled rows are zero vectors
        assert np.all(emb_s[~valid] == 0.0)

        # full view completes lazily (retention holds the scan frames)
        emb_f, ts_f = scan.frame_embeddings(test_video, video_id="v",
                                            rows="full")
        assert ts_f == ts
        assert scan.cache.get("v", tag, scan.reader.sample_rate) is not None
        # completed rows agree with a dense scan of the same video
        monkeypatch.setattr(settings, "SCAN_SPARSE_COLD", False)
        dense = _scan(tiny_engine, tmp_path, "c2")
        emb_d, _ = dense.frame_embeddings(test_video, video_id="v2")
        np.testing.assert_allclose(emb_f, emb_d, atol=1e-5)

    def test_completion_via_decode_fallback(self, test_video, tiny_engine,
                                            tmp_path, monkeypatch):
        monkeypatch.setattr(settings, "SCAN_DEDUP_EPS", 0.0)
        monkeypatch.setattr(settings, "SCAN_SPARSE_COLD", True)
        scan = _scan(tiny_engine, tmp_path, "f")
        scan.frame_embeddings(test_video, video_id="v", rows="scan")
        scan.retention.release()        # evict the retained frames
        emb_f, _ = scan.frame_embeddings(test_video, video_id="v",
                                         rows="full")
        monkeypatch.setattr(settings, "SCAN_SPARSE_COLD", False)
        dense = _scan(tiny_engine, tmp_path, "f2")
        emb_d, _ = dense.frame_embeddings(test_video, video_id="v2")
        np.testing.assert_allclose(emb_f, emb_d, atol=1e-5)

    def test_broken_metadata_count(self, test_video, tiny_engine,
                                   tmp_path, monkeypatch):
        from avede_tpu.ops.windows import window_middle_indices

        monkeypatch.setattr(settings, "SCAN_DEDUP_EPS", 0.0)
        monkeypatch.setattr(settings, "SCAN_SPARSE_COLD", True)
        scan = _scan(tiny_engine, tmp_path, "m")
        # container claims fewer frames than decode yields: the mid set
        # computed upfront misses the real tail windows
        monkeypatch.setattr(scan.reader, "expected_sample_count",
                            lambda *a, **k: 40)
        emb, ts = scan.frame_embeddings(test_video, video_id="v",
                                        rows="scan")
        mids = window_middle_indices(len(ts), settings.WINDOW_SIZE,
                                     settings.WINDOW_STRIDE)
        ent = scan.cache.get_entry("v", scan.cache_tag(),
                                   scan.reader.sample_rate)
        assert ent is not None
        valid = ent[2]
        assert valid is not None and valid[mids].all()
        assert np.all(np.linalg.norm(emb[mids], axis=1) > 0.5)

    def test_retention_ms_key_collision(self, test_video, tiny_engine,
                                        tmp_path, monkeypatch):
        """Rows whose DIFFERENT timestamps quantize to one ms key must
        NOT be served from the single retained frame (it could be a
        neighbor frame); equal timestamps sharing a key are fine."""
        monkeypatch.setattr(settings, "SCAN_DEDUP_EPS", 0.0)
        monkeypatch.setattr(settings, "SCAN_SPARSE_COLD", True)
        scan = _scan(tiny_engine, tmp_path, "k")
        _, ts = scan.frame_embeddings(test_video, video_id="v",
                                      rows="scan")
        # true duplicates (same ts twice): retention path serves both
        dup = [ts[0], ts[0], ts[1]]
        rows = scan._embed_rows_from_retention("v", dup,
                                               np.arange(3))
        assert rows is not None and len(rows) == 3
        np.testing.assert_allclose(rows[0], rows[1], atol=1e-7)
        # different ts colliding on one ms key: refuse (decode
        # fallback embeds each index exactly instead)
        near = [ts[0], ts[0] + 0.0004]
        from avede_tpu.io.frame_retention import ts_key
        assert ts_key(near[0]) == ts_key(near[1])
        assert scan._embed_rows_from_retention(
            "v", near, np.arange(2)) is None

    def test_sparse_hit_serves_scan_rows(self, test_video, tiny_engine,
                                         tmp_path, monkeypatch):
        monkeypatch.setattr(settings, "SCAN_DEDUP_EPS", 0.0)
        monkeypatch.setattr(settings, "SCAN_SPARSE_COLD", True)
        scan = _scan(tiny_engine, tmp_path, "h")
        r1 = scan.process_video(test_video, "a white square",
                                top_k=5, threshold=-1.0, video_id="v")
        # second query must not decode: break the reader to prove it
        scan.reader.stream_frames = None  # type: ignore
        r2 = scan.process_video(test_video, "a white square",
                                top_k=5, threshold=-1.0, video_id="v")
        assert [x["window_index"] for x in r1] == \
               [x["window_index"] for x in r2]

    def test_sparse_exact_at_default_eps(self, test_video, tiny_engine,
                                         tmp_path, monkeypatch):
        """At the DEFAULT dedup eps the sparse scan never gates: its
        middle rows are embedded exactly, so phase-1 values equal an
        exact (eps=0 dense) scan's — value-level, not just shape
        (round-4 advisor medium finding: the old gated sparse scan
        could diverge from dense under the same cache tag)."""
        monkeypatch.setattr(settings, "SCAN_DEDUP_EPS", 0.0)
        monkeypatch.setattr(settings, "SCAN_SPARSE_COLD", False)
        exact = _scan(tiny_engine, tmp_path, "x").process_video(
            test_video, "a white square", top_k=5, threshold=-1.0)
        monkeypatch.setattr(settings, "SCAN_DEDUP_EPS", 1.5)
        monkeypatch.setattr(settings, "SCAN_SPARSE_COLD", True)
        scan = _scan(tiny_engine, tmp_path, "e")
        res = scan.process_video(test_video, "a white square",
                                 top_k=5, threshold=-1.0, video_id="v")
        assert len(res) == len(exact) > 0
        for a, b in zip(res, exact):
            assert a["window_index"] == b["window_index"]
            np.testing.assert_allclose(a["confidence"], b["confidence"],
                                       atol=1e-6)


class TestImageMatcherSparseSynergy:
    def test_frame_data_completes_sparse_entry(self, test_video,
                                               tiny_engine, tmp_path,
                                               monkeypatch):
        """ImageMatcher holds every decoded frame already, so a sparse
        cold-scan entry must be completed by embedding ONLY the missing
        rows (and upgraded on disk), never re-embedded wholesale."""
        from avede_tpu.services.image_matcher import ImageMatcher

        monkeypatch.setattr(settings, "SCAN_DEDUP_EPS", 0.0)
        monkeypatch.setattr(settings, "SCAN_SPARSE_COLD", True)
        scan = _scan(tiny_engine, tmp_path, "im")
        scan.frame_embeddings(test_video, video_id="v", rows="scan")
        tag = scan.cache_tag()
        assert scan.cache.get("v", tag, scan.reader.sample_rate) is None

        matcher = ImageMatcher(tiny_engine, reader=scan.reader,
                               cache=scan.cache)
        calls = []
        real_embed = tiny_engine.embed_frames

        def spy(frames):
            calls.append(len(frames))
            return real_embed(frames)

        monkeypatch.setattr(tiny_engine, "embed_frames", spy)
        frames, ts, emb = matcher._frame_data(test_video, "v")
        # only the missing rows were embedded, not the whole video
        ent = scan.cache.get_entry("v", tag, scan.reader.sample_rate)
        assert ent is not None and ent[2] is None     # complete now
        assert len(calls) == 1 and calls[0] < len(frames)
        assert len(emb) == len(frames)
        # agrees with a dense scan
        monkeypatch.setattr(settings, "SCAN_SPARSE_COLD", False)
        dense = _scan(tiny_engine, tmp_path, "im2")
        emb_d, _ = dense.frame_embeddings(test_video, video_id="v2")
        np.testing.assert_allclose(emb, emb_d, atol=1e-5)


class TestCacheSparseFormat:
    def test_round_trip_and_complete_rows(self, tmp_path):
        from avede_tpu.io.embedding_cache import EmbeddingCache

        cache = EmbeddingCache(str(tmp_path))
        rng = np.random.default_rng(0)
        emb = rng.normal(size=(10, 8)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        valid = np.zeros(10, bool)
        valid[[2, 5, 9]] = True
        sparse = np.where(valid[:, None], emb, 0.0).astype(np.float32)
        ts = [float(i) for i in range(10)]
        stored = cache.put("v", sparse, ts, "tag", (64, 96), 1,
                           valid=valid)
        assert cache.get("v", "tag", 1) is None
        got = cache.get_entry("v", "tag", 1)
        assert got is not None and got[2] is not None
        np.testing.assert_array_equal(got[2], valid)
        # disk round trip too (drop the memory tier)
        cache._mem.clear()
        cache._mem_bytes = 0
        got = cache.get_entry("v", "tag", 1)
        assert got is not None and got[2] is not None

        missing = np.where(~valid)[0]
        merged = cache.complete_rows("v", "tag", 1, emb[missing], missing)
        assert merged is not None
        assert cache.get("v", "tag", 1) is not None
        np.testing.assert_allclose(merged, emb, atol=2e-2)
        # previously-stored rows byte-stable under the re-quantization
        np.testing.assert_array_equal(merged[valid], stored[valid])

    def test_all_true_valid_stores_complete(self, tmp_path):
        from avede_tpu.io.embedding_cache import EmbeddingCache

        cache = EmbeddingCache(str(tmp_path))
        emb = np.eye(4, 8, dtype=np.float32)
        cache.put("v", emb, [0.0, 1.0, 2.0, 3.0], "tag", (4, 4), 1,
                  valid=np.ones(4, bool))
        assert cache.get("v", "tag", 1) is not None

    def test_dedup_gated_provenance(self, tmp_path):
        """meta records which producer wrote the table: gated (dense
        scan with eps>0) vs exact (sparse scan, backfill, image
        matcher) — round-4 advisor finding on backfill provenance."""
        import json

        from avede_tpu.io.embedding_cache import EmbeddingCache

        def meta_of(cache, vid):
            with np.load(cache._path(vid)) as z:
                return json.loads(bytes(z["meta"].tobytes()).decode())

        cache = EmbeddingCache(str(tmp_path))
        emb = np.eye(4, 8, dtype=np.float32)
        ts = [0.0, 1.0, 2.0, 3.0]
        cache.put("g", emb, ts, "tag", (4, 4), 1, gated=True)
        assert meta_of(cache, "g")["dedup_gated"] is True
        cache.put("x", emb, ts, "tag", (4, 4), 1)
        assert meta_of(cache, "x")["dedup_gated"] is False
        # completing a sparse entry stores exact provenance
        valid = np.array([True, False, True, False])
        cache.put("s", np.where(valid[:, None], emb, 0.0), ts, "tag",
                  (4, 4), 1, valid=valid)
        assert meta_of(cache, "s")["dedup_gated"] is False
        missing = np.where(~valid)[0]
        assert cache.complete_rows("s", "tag", 1, emb[missing],
                                   missing) is not None
        m = meta_of(cache, "s")
        assert m["complete"] is True and m["dedup_gated"] is False
