"""Device-resident library index: correctness vs a numpy oracle,
incremental add/remove, growth+compaction, and the indexed
LibrarySearch path's per-video-cap semantics."""

import numpy as np
import pytest


def _unit(rng, n, d):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


class TestDeviceLibraryIndex:
    def _index(self, dim=32, dtype="float32"):
        from avede_tpu.services.library_index import DeviceLibraryIndex

        # float32 on the CPU test backend so scores match numpy exactly
        return DeviceLibraryIndex(dim, dtype=dtype)

    def test_search_matches_numpy(self):
        rng = np.random.default_rng(0)
        idx = self._index()
        tables = {}
        for i, n in enumerate((10, 25, 7)):
            emb = _unit(rng, n, 32)
            tables[f"v{i}"] = emb
            idx.add(f"v{i}", emb, np.arange(n, dtype=np.float32))
        q = _unit(rng, 1, 32)[0]

        all_emb = np.concatenate(list(tables.values()))
        expect = np.sort(all_emb @ q)[::-1][:5]
        got = idx.search(q, 5)
        np.testing.assert_allclose(
            [r["confidence"] for r in got], expect, atol=1e-5)
        # row bookkeeping: every hit maps into its source table
        for r in got:
            emb = tables[r["video_id"]]
            assert r["frame_index"] < len(emb)
            np.testing.assert_allclose(
                float(emb[r["frame_index"]] @ q), r["confidence"],
                atol=1e-5)
            assert r["timestamp"] == float(r["frame_index"])

    def test_replace_and_remove(self):
        rng = np.random.default_rng(1)
        idx = self._index()
        a = _unit(rng, 8, 32)
        b = _unit(rng, 6, 32)
        idx.add("a", a, np.arange(8.0))
        idx.add("b", b, np.arange(6.0))
        assert idx.n_videos == 2 and idx.n_rows == 14
        # replace a with fewer rows
        a2 = _unit(rng, 4, 32)
        idx.add("a", a2, np.arange(4.0))
        assert idx.n_videos == 2 and idx.n_rows == 10
        q = _unit(rng, 1, 32)[0]
        hits = idx.search(q, 10)
        assert {h["video_id"] for h in hits} == {"a", "b"}
        assert max(h["frame_index"] for h in hits
                   if h["video_id"] == "a") < 4
        idx.remove("b")
        hits = idx.search(q, 10)
        assert {h["video_id"] for h in hits} == {"a"}
        assert len(hits) == 4

    def test_growth_compacts_holes(self):
        from avede_tpu.services import library_index as li

        rng = np.random.default_rng(2)
        idx = self._index()
        # fill past _MIN_CAPACITY through several bucket-sized adds with
        # one removal in the middle → growth must compact the hole
        idx.add("x", _unit(rng, 300, 32), np.arange(300.0))
        idx.add("y", _unit(rng, 300, 32), np.arange(300.0))
        idx.remove("x")
        big = _unit(rng, li._MIN_CAPACITY, 32)
        idx.add("z", big, np.arange(float(li._MIN_CAPACITY)))
        assert idx.capacity >= li._MIN_CAPACITY
        assert idx.n_rows == 300 + li._MIN_CAPACITY
        q = _unit(rng, 1, 32)[0]
        hits = idx.search(q, 3)
        # oracle over the surviving spans' rows (read from the shadow)
        all_emb = np.concatenate([idx._shadow[s: s + n].astype(np.float32)
                                  for _, s, n, _, _ in idx._spans])
        expect = np.sort(all_emb @ q)[::-1][:3]
        # f32 index keeps an f32 shadow, so growth is exact
        np.testing.assert_allclose([h["confidence"] for h in hits],
                                   expect, atol=1e-5)

    def test_add_collapses_identical_runs(self, monkeypatch):
        """Identical consecutive rows (the scan's dedup-scatter output)
        collapse to the run head — same scores, run-start timestamps,
        ~run-length× fewer stored rows."""
        from avede_tpu.utils.config import settings

        monkeypatch.setattr(settings, "LIBRARY_INDEX_DEDUP", True)
        rng = np.random.default_rng(13)
        idx = self._index()
        uniq = _unit(rng, 4, 32)
        # frames: AAAA BB CCCC D (runs of 4/2/4/1) = 11 rows, 4 unique
        emb = np.concatenate([np.tile(uniq[0], (4, 1)),
                              np.tile(uniq[1], (2, 1)),
                              np.tile(uniq[2], (4, 1)),
                              uniq[3][None]])
        ts = np.arange(11.0)
        idx.add("v", emb, ts)
        assert idx.n_rows == 4
        hits = idx.search(uniq[2], 2)
        assert hits[0]["timestamp"] == 6.0   # run C starts at frame 6
        # frame_index reports the ORIGINAL sampled-frame index, not the
        # offset into the collapsed table (host-path compatible)
        assert hits[0]["frame_index"] == 6
        np.testing.assert_allclose(hits[0]["confidence"], 1.0, atol=1e-5)

        monkeypatch.setattr(settings, "LIBRARY_INDEX_DEDUP", False)
        idx2 = self._index()
        idx2.add("v", emb, ts)
        assert idx2.n_rows == 11

    def test_int8_mode_ranks_like_f32(self):
        """int8 per-row storage must preserve ranking on separated data
        and keep scores within the cache tier's drift budget."""
        rng = np.random.default_rng(11)
        f32 = self._index(dim=32, dtype="float32")
        i8 = self._index(dim=32, dtype="int8")
        for i, n in enumerate((30, 45)):
            emb = _unit(rng, n, 32)
            f32.add(f"v{i}", emb, np.arange(float(n)))
            i8.add(f"v{i}", emb, np.arange(float(n)))
        q = _unit(rng, 1, 32)[0]
        a = f32.search(q, 6)
        b = i8.search(q, 6)
        assert [(r["video_id"], r["frame_index"]) for r in a] == \
               [(r["video_id"], r["frame_index"]) for r in b]
        np.testing.assert_allclose([r["confidence"] for r in a],
                                   [r["confidence"] for r in b],
                                   atol=2e-2)
        # growth keeps working in int8 mode
        from avede_tpu.services import library_index as li

        i8.add("big", _unit(rng, li._MIN_CAPACITY, 32),
               np.arange(float(li._MIN_CAPACITY)))
        assert i8.search(q, 3)

    def test_sharded_matches_single_device(self):
        """Rows sharded over the 8-device data axis must return exactly
        the single-device results (XLA merges the top-k over the mesh)."""
        import jax

        from avede_tpu.parallel.mesh import build_mesh
        from avede_tpu.services.library_index import DeviceLibraryIndex

        rng = np.random.default_rng(5)
        mesh = build_mesh(jax.devices())
        sharded = DeviceLibraryIndex(32, dtype="float32", mesh=mesh)
        local = DeviceLibraryIndex(32, dtype="float32")
        for i, n in enumerate((40, 300, 17)):
            emb = _unit(rng, n, 32)
            for idx in (sharded, local):
                idx.add(f"v{i}", emb, np.arange(float(n)))
        assert sharded.capacity % mesh.n_data == 0
        q = _unit(rng, 1, 32)[0]
        a = sharded.search(q, 9)
        b = local.search(q, 9)
        assert [(r["video_id"], r["frame_index"]) for r in a] == \
               [(r["video_id"], r["frame_index"]) for r in b]
        np.testing.assert_allclose([r["confidence"] for r in a],
                                   [r["confidence"] for r in b],
                                   atol=1e-6)

    def test_concurrent_adds_and_searches(self):
        """Searches racing adds/removes must never crash or return rows
        that fail to map back to a live span snapshot."""
        import threading

        rng = np.random.default_rng(9)
        idx = self._index(dim=16)
        idx.add("seed", _unit(rng, 12, 16), np.arange(12.0))
        q = _unit(rng, 1, 16)[0]
        errors = []
        stop = threading.Event()
        remaining = [3]
        rlock = threading.Lock()

        def writer(tid):
            r = np.random.default_rng(tid)
            try:
                for i in range(8):
                    vid = f"w{tid}_{i % 3}"
                    idx.add(vid, _unit(r, 5 + i, 16),
                            np.arange(float(5 + i)))
                    if i % 3 == 2:
                        idx.remove(vid)
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)
            finally:
                # the reader must keep racing until the LAST writer
                # finishes — a single shared event set by the first
                # writer would end the race window early
                with rlock:
                    remaining[0] -= 1
                    if remaining[0] == 0:
                        stop.set()

        def reader():
            try:
                while not stop.is_set():
                    for r in idx.search(q, 8):
                        assert isinstance(r["video_id"], str)
                        assert np.isfinite(r["confidence"])
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        threads = [threading.Thread(target=writer, args=(t,))
                   for t in range(3)] + [threading.Thread(target=reader)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not errors, errors
        assert idx.search(q, 4)  # index still serves

    def test_empty_and_zero_row_add(self):
        idx = self._index()
        assert idx.search(np.zeros(32, np.float32), 5) == []
        idx.add("empty", np.zeros((0, 32), np.float32), [])
        assert idx.n_videos == 0

    def test_mismatched_timestamps_raise(self):
        """A ts array shorter (or longer) than the embedding table must
        raise at add time — a silent mismatch used to surface as
        timestamp 0.0 on hits after run-collapse."""
        rng = np.random.default_rng(21)
        idx = self._index()
        emb = _unit(rng, 8, 32)
        with pytest.raises(ValueError, match="timestamps length"):
            idx.add("v", emb, np.arange(5.0))
        with pytest.raises(ValueError, match="timestamps length"):
            idx.add("v", emb, np.arange(11.0))
        assert idx.n_videos == 0

    def test_dedup_short_ts_raises(self, monkeypatch):
        """Run-collapse must never be reached with a short ts array
        (the old code truncated and zero-filled tail timestamps)."""
        from avede_tpu.utils.config import settings

        monkeypatch.setattr(settings, "LIBRARY_INDEX_DEDUP", True)
        rng = np.random.default_rng(22)
        idx = self._index()
        uniq = _unit(rng, 2, 32)
        emb = np.concatenate([np.tile(uniq[0], (3, 1)),
                              np.tile(uniq[1], (3, 1))])
        with pytest.raises(ValueError, match="timestamps length"):
            idx.add("v", emb, np.arange(4.0))

    def test_int8_growth_requantization_drift(self):
        """Growth + compaction re-quantizes from the host shadow; the
        shadow is f32 in int8 mode, so the end-to-end cosine drift vs
        exact f32 scores must stay within the tier's one-rounding
        budget even after a forced growth+compaction cycle."""
        from avede_tpu.services import library_index as li

        rng = np.random.default_rng(23)
        i8 = self._index(dim=64, dtype="int8")
        f32 = self._index(dim=64, dtype="float32")
        tables = {}
        for i, n in enumerate((200, 300)):
            tables[f"v{i}"] = _unit(rng, n, 64)
        # force growth twice: fill, remove (hole), then oversize add
        for vid, emb in tables.items():
            i8.add(vid, emb, np.arange(float(len(emb))))
            f32.add(vid, emb, np.arange(float(len(emb))))
        i8.remove("v0"); f32.remove("v0")
        big = _unit(rng, li._MIN_CAPACITY, 64)
        tables["big"] = big
        i8.add("big", big, np.arange(float(li._MIN_CAPACITY)))
        f32.add("big", big, np.arange(float(li._MIN_CAPACITY)))
        del tables["v0"]

        q = _unit(rng, 1, 64)[0]
        a = i8.search(q, 16)
        b = f32.search(q, 16)
        # per-row int8 over unit-norm rows: one rounding ≈ 1/254 per
        # component worst case; score drift stays well under 1e-2 and,
        # crucially, does NOT double after growth re-quantization
        np.testing.assert_allclose([r["confidence"] for r in a],
                                   [r["confidence"] for r in b],
                                   atol=6e-3)

    def test_bf16_growth_drift_within_budget(self):
        """The bf16 tier's f16 shadow must keep post-growth scores
        within the tier's own ≤1e-3 budget (f16 is strictly finer than
        bf16, so growth adds no visible drift)."""
        from avede_tpu.services import library_index as li

        rng = np.random.default_rng(24)
        bf = self._index(dim=64, dtype="bfloat16")
        f32 = self._index(dim=64, dtype="float32")
        first = _unit(rng, 400, 64)
        for idx in (bf, f32):
            idx.add("a", first, np.arange(400.0))
        big = _unit(rng, li._MIN_CAPACITY, 64)
        for idx in (bf, f32):
            idx.add("b", big, np.arange(float(li._MIN_CAPACITY)))
        q = _unit(rng, 1, 64)[0]
        a = bf.search(q, 16)
        b = f32.search(q, 16)
        np.testing.assert_allclose([r["confidence"] for r in a],
                                   [r["confidence"] for r in b],
                                   atol=5e-3)


class TestIndexedLibrarySearch:
    def test_matches_per_table_path(self, tmp_data_dirs, monkeypatch):
        """The indexed whole-library path returns the same hits as the
        host per-table path on the same library."""
        import cv2

        from avede_tpu.models.clip import tiny_test_config
        from avede_tpu.parallel.embed import ClipEngine
        from avede_tpu.pipelines.phase1 import Phase1Scan
        from avede_tpu.services.library_search import LibrarySearch
        from avede_tpu.utils.config import settings

        rng = np.random.default_rng(0)
        for name in ("vid1", "vid2"):
            path = str(tmp_data_dirs / "videos" / f"{name}.mp4")
            w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                                8.0, (64, 64))
            for i in range(24):
                frame = rng.integers(0, 255, (64, 64, 3), np.uint8)
                w.write(frame)
            w.release()

        # dtype must be set BEFORE construction: the index is built
        # eagerly in __init__ (race-free sharing across requests)
        monkeypatch.setattr(settings, "LIBRARY_INDEX_ENABLED", True)
        monkeypatch.setattr(settings, "LIBRARY_INDEX_DTYPE", "float32")
        engine = ClipEngine(cfg=tiny_test_config())
        search = LibrarySearch(Phase1Scan(engine))

        indexed = search.search("a thing", top_k=6, threshold=-1.0)
        assert indexed["metadata"]["index"]["device_resident"]

        monkeypatch.setattr(settings, "LIBRARY_INDEX_ENABLED", False)
        host = search.search("a thing", top_k=6, threshold=-1.0)

        assert len(indexed["results"]) == len(host["results"])
        for a, b in zip(indexed["results"], host["results"]):
            assert a["video_id"] == b["video_id"]
            assert a["frame_index"] == b["frame_index"]
            np.testing.assert_allclose(a["confidence"], b["confidence"],
                                       atol=1e-4)

    def test_deleted_video_evicted(self, tmp_data_dirs, monkeypatch):
        """A video removed from VIDEO_DIR must stop appearing in
        indexed search results (eviction on the next search)."""
        import os

        import cv2

        from avede_tpu.models.clip import tiny_test_config
        from avede_tpu.parallel.embed import ClipEngine
        from avede_tpu.pipelines.phase1 import Phase1Scan
        from avede_tpu.services.library_search import LibrarySearch
        from avede_tpu.utils.config import settings

        monkeypatch.setattr(settings, "LIBRARY_INDEX_ENABLED", True)
        rng = np.random.default_rng(0)
        paths = {}
        for name in ("keep", "gone"):
            p = str(tmp_data_dirs / "videos" / f"{name}.mp4")
            w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"),
                                8.0, (64, 64))
            for _ in range(16):
                w.write(rng.integers(0, 255, (64, 64, 3), np.uint8))
            w.release()
            paths[name] = p

        search = LibrarySearch(Phase1Scan(ClipEngine(
            cfg=tiny_test_config())))
        out = search.search("anything", top_k=8, threshold=-1.0)
        assert {r["video_id"] for r in out["results"]} == {"keep", "gone"}

        os.remove(paths["gone"])
        out = search.search("anything", top_k=8, threshold=-1.0)
        assert {r["video_id"] for r in out["results"]} == {"keep"}
        assert not search._index.has("gone")

    def test_per_video_cap(self, tmp_data_dirs):
        """per_video_k caps hits per video even when one video owns the
        global top scores."""
        from avede_tpu.services.library_index import DeviceLibraryIndex
        from avede_tpu.services.library_search import LibrarySearch

        rng = np.random.default_rng(3)

        import threading

        search = LibrarySearch.__new__(LibrarySearch)
        search._index = DeviceLibraryIndex(16, dtype="float32")
        search._populate_lock = threading.Lock()
        q = _unit(rng, 1, 16)[0]
        # "hot" video: 20 rows nearly equal to q; "cold": orthogonal-ish
        hot = np.tile(q, (20, 1)) + 0.01 * rng.normal(size=(20, 16))
        hot /= np.linalg.norm(hot, axis=-1, keepdims=True)
        cold = _unit(rng, 20, 16)
        search._index.add("hot", hot.astype(np.float32), np.arange(20.0))
        search._index.add("cold", cold.astype(np.float32),
                          np.arange(20.0))

        class FakeEngine:
            def embed_texts(self, _):
                return q[None]

        class FakePhase1:
            engine = FakeEngine()

        search.phase1 = FakePhase1()
        # index already populated; listing must cover it or the
        # eviction sweep would drop the manually-added videos
        search.list_videos = lambda: ["hot", "cold"]
        search._resolve = lambda vid: vid  # never reached (has() True)
        out = search._search_indexed("q", top_k=6, threshold=-1.0,
                                     per_video_k=3, t0=0.0)
        per_vid = {}
        for r in out["results"]:
            per_vid[r["video_id"]] = per_vid.get(r["video_id"], 0) + 1
        assert per_vid["hot"] == 3
        assert per_vid.get("cold", 0) == 3


class TestPrewarm:
    def test_prewarm_populates_before_first_search(self, tmp_data_dirs,
                                                   monkeypatch):
        """prewarm() embeds + indexes the library so the first search
        does no population work (the LIBRARY_PREWARM serving path)."""
        import cv2

        from avede_tpu.models.clip import tiny_test_config
        from avede_tpu.parallel.embed import ClipEngine
        from avede_tpu.pipelines.phase1 import Phase1Scan
        from avede_tpu.services.library_search import LibrarySearch
        from avede_tpu.utils.config import settings

        rng = np.random.default_rng(3)
        for name in ("pw1", "pw2"):
            path = str(tmp_data_dirs / "videos" / f"{name}.mp4")
            w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                                8.0, (64, 64))
            for _ in range(16):
                w.write(rng.integers(0, 255, (64, 64, 3), np.uint8))
            w.release()
        monkeypatch.setattr(settings, "LIBRARY_INDEX_ENABLED", True)
        engine = ClipEngine(cfg=tiny_test_config())
        phase1 = Phase1Scan(engine)
        search = LibrarySearch(phase1)

        assert search.prewarm() == 2
        rows_after_prewarm = search._index.n_rows
        assert rows_after_prewarm > 0

        # first search must not embed anything new
        calls = {"n": 0}
        orig = phase1.frame_embeddings

        def counting(*a, **k):
            calls["n"] += 1
            return orig(*a, **k)

        phase1.frame_embeddings = counting
        out = search.search("anything", top_k=4, threshold=-1.0)
        assert out["results"]
        assert calls["n"] == 0
        assert search._index.n_rows == rows_after_prewarm
