"""Duplicate-frame gating in the phase-1 scan (ops/dedup.py)."""

import numpy as np
import pytest

from tests.conftest import make_test_video


@pytest.fixture(scope="module")
def engine():
    from avede_tpu.models.clip import init_clip, tiny_test_config
    from avede_tpu.parallel.embed import ClipEngine

    _, params = init_clip(tiny_test_config(), seed=0)
    return ClipEngine(cfg=tiny_test_config(), params=params)


class TestFrameDeduper:
    def test_runs_collapse_to_representatives(self):
        from avede_tpu.ops.dedup import FrameDeduper

        rng = np.random.default_rng(0)
        a = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        b = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        frames = np.stack([a, a, a, b, b, a])
        d = FrameDeduper(eps=1.5)
        uniq = d.filter(frames)
        assert len(uniq) == 3                      # a, b, a
        assert d.mapping == [0, 0, 0, 1, 1, 2]
        emb = np.arange(3, dtype=np.float32)[:, None] * np.ones((3, 4))
        full = d.scatter(emb)
        assert full.shape == (6, 4)
        np.testing.assert_array_equal(full[:, 0], [0, 0, 0, 1, 1, 2])

    def test_streaming_across_chunks(self):
        from avede_tpu.ops.dedup import FrameDeduper

        a = np.full((16, 16, 3), 40, np.uint8)
        b = np.full((16, 16, 3), 200, np.uint8)
        d = FrameDeduper(eps=1.5)
        u1 = d.filter(np.stack([a, a]))
        u2 = d.filter(np.stack([a, b]))     # first frame dups across chunk
        assert len(u1) == 1 and len(u2) == 1
        assert d.mapping == [0, 0, 0, 1]
        assert d.n_unique == 2 and d.n_total == 4

    def test_real_motion_never_merges(self):
        from avede_tpu.ops.dedup import FrameDeduper

        frames = []
        for i in range(5):
            f = np.zeros((64, 64, 3), np.uint8)
            f[:, i * 12: i * 12 + 12] = 255
            frames.append(f)
        d = FrameDeduper(eps=1.5)
        assert len(d.filter(np.stack(frames))) == 5

    def test_scatter_length_mismatch_raises(self):
        from avede_tpu.ops.dedup import FrameDeduper

        d = FrameDeduper(eps=1.5)
        d.filter(np.zeros((3, 8, 8, 3), np.uint8))
        with pytest.raises(ValueError):
            d.scatter(np.zeros((3, 4)))           # 3 frames → 1 unique


class TestDetectionDedup:
    def test_detector_runs_once_per_duplicate_run(self, engine,
                                                  monkeypatch):
        """Static frame batches hit the detection tower once per run
        representative, with per-frame result dicts kept independent."""
        from avede_tpu.models.owlvit import init_owlvit, tiny_owlvit_config
        from avede_tpu.services.universal_detector import UniversalDetector
        from avede_tpu.utils.config import settings

        ocfg = tiny_owlvit_config()
        _, oparams = init_owlvit(ocfg, seed=0)
        ud = UniversalDetector(engine, owlvit_cfg=ocfg,
                               owlvit_params=oparams)
        seen = []
        orig = ud.detect_owlvit

        def counting(fb, queries, thr):
            seen.append(len(fb))
            return orig(fb, queries, thr)

        monkeypatch.setattr(ud, "detect_owlvit", counting)
        monkeypatch.setattr(settings, "SCAN_DEDUP_EPS", 1.5)
        frame = np.random.default_rng(0).integers(
            0, 255, (32, 32, 3), dtype=np.uint8)
        frames = np.stack([frame] * 6)
        dets = ud.detect_unlimited_objects(frames, ["thing"],
                                           detection_mode="owlvit",
                                           conf_threshold=-1.0,
                                           adaptive=False)
        assert seen == [1]                      # one representative
        assert len(dets) == 6
        if dets[0]:
            assert dets[0][0] is not dets[1][0]     # independent dicts
            assert dets[0][0]["bbox"] == dets[1][0]["bbox"]


    def test_spatial_tiles_never_deduped(self, engine, monkeypatch):
        """SmallObjectService tiles are SPATIAL crops of one frame — a
        blank background tile next to a near-identical one must still
        be scored at its own offset (regression: the dedup gate used to
        fire on tile batches, dropping/fabricating small objects)."""
        from avede_tpu.services.small_object import SmallObjectService
        from avede_tpu.services.universal_detector import UniversalDetector
        from avede_tpu.utils.config import settings

        monkeypatch.setattr(settings, "SCAN_DEDUP_EPS", 1.5)
        ud = UniversalDetector(engine)
        seen = []
        orig = ud.clip_grid.detect

        def counting(fb, queries, thr):
            seen.append(len(fb))
            return orig(fb, queries, thr)

        monkeypatch.setattr(ud.clip_grid, "detect", counting)
        svc = SmallObjectService(engine, detector=ud, tile=32, overlap=0)
        frame = np.full((64, 64, 3), 30, np.uint8)   # 4 identical tiles
        frame[40:52, 40:52] = 255                    # object in ONE tile
        svc.detect_in_frame(frame, ["bright square"],
                            conf_threshold=-1.0, enable_rpn=False,
                            enable_adaptive_thresholds=False,
                            detection_mode="clip")
        assert sum(seen) == 4                        # every tile scored


class TestPhase1Dedup:
    def test_static_video_scan_equivalent(self, engine, tmp_path,
                                          monkeypatch):
        """A static video scans to the same results with dedup on/off,
        embedding only a handful of unique frames."""
        from avede_tpu.pipelines.phase1 import Phase1Scan
        from avede_tpu.utils.config import settings

        video = make_test_video(tmp_path / "static.mp4", n_frames=40,
                                moving=False)
        monkeypatch.setattr(settings, "SCAN_DEDUP_EPS", 0.0)
        base = Phase1Scan(engine, cache=None).process_video(
            video, "white square", top_k=4, threshold=-1.0)
        monkeypatch.setattr(settings, "SCAN_DEDUP_EPS", 1.5)
        dedup = Phase1Scan(engine, cache=None).process_video(
            video, "white square", top_k=4, threshold=-1.0)
        assert len(base) == len(dedup)
        for r1, r2 in zip(base, dedup):
            assert r1["window_index"] == r2["window_index"]
            assert r1["confidence"] == pytest.approx(r2["confidence"],
                                                     abs=1e-5)

    def test_cache_key_isolated_by_eps(self, engine, tmp_path,
                                       monkeypatch):
        from avede_tpu.io.embedding_cache import EmbeddingCache
        from avede_tpu.pipelines.phase1 import Phase1Scan
        from avede_tpu.utils.config import settings

        video = make_test_video(tmp_path / "v.mp4", n_frames=30)
        cache = EmbeddingCache(str(tmp_path / "emb"))
        monkeypatch.setattr(settings, "SCAN_DEDUP_EPS", 1.5)
        p = Phase1Scan(engine, cache=cache)
        emb1, _ = p.frame_embeddings(video)
        monkeypatch.setattr(settings, "SCAN_DEDUP_EPS", 0.0)
        # different eps must NOT hit the dedup-tagged entry
        emb2, _ = p.frame_embeddings(video)
        assert emb1.shape == emb2.shape


class TestRebatch:
    """rebatch coalesces dedup-filtered chunks back to one bucket
    shape so the scan stays on a single compiled program."""

    def test_preserves_order_and_content(self):
        from avede_tpu.ops.dedup import rebatch

        rng = np.random.default_rng(0)
        parts = [rng.integers(0, 255, (n, 4, 4, 3), np.uint8)
                 for n in (1, 0, 300, 7, 250, 0, 2)]
        out = list(rebatch(iter(parts), 256))
        whole = np.concatenate([p for p in parts if len(p)])
        assert [len(o) for o in out] == [256, 256, 48]
        assert np.array_equal(np.concatenate(out), whole)

    def test_exact_multiple_has_no_empty_tail(self):
        from avede_tpu.ops.dedup import rebatch

        whole = np.arange(512 * 3, dtype=np.uint8).reshape(512, 3)
        out = list(rebatch(iter([whole]), 256))
        assert [len(o) for o in out] == [256, 256]
        assert np.array_equal(np.concatenate(out), whole)

    def test_empty_stream(self):
        from avede_tpu.ops.dedup import rebatch

        empty = np.zeros((0, 4, 4, 3), np.uint8)
        assert list(rebatch(iter([empty, empty]), 256)) == []

    def test_invalid_size_raises(self):
        from avede_tpu.ops.dedup import rebatch

        with pytest.raises(ValueError):
            list(rebatch(iter([]), 0))

    def test_small_chunks_coalesce(self):
        from avede_tpu.ops.dedup import rebatch

        # the dedup regime: many 1-2 frame survivors per 256-chunk
        parts = [np.full((n, 2, 2, 3), i, np.uint8)
                 for i, n in enumerate([1, 2, 1, 1, 3, 1])]
        out = list(rebatch(iter(parts), 4))
        assert [len(o) for o in out] == [4, 4, 1]
        whole = np.concatenate(parts)
        assert np.array_equal(np.concatenate(out), whole)
