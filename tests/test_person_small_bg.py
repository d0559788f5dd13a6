"""Person re-ID, small-object, region-proposal, and
background-independence service tests."""

import numpy as np
import pytest

from tests.conftest import make_test_video


@pytest.fixture(scope="module")
def engine():
    import jax

    from avede_tpu.models.clip import init_clip, tiny_test_config
    from avede_tpu.parallel.embed import ClipEngine
    from avede_tpu.parallel.mesh import build_mesh

    model, params = init_clip(tiny_test_config(), seed=0)
    return ClipEngine(cfg=tiny_test_config(), params=params,
                      mesh=build_mesh(jax.devices()[:1]))


@pytest.fixture(scope="module")
def tiny_yolo():
    from avede_tpu.models.yolo import init_yolo, tiny_yolo_config
    from avede_tpu.services.detector import YoloService

    ycfg = tiny_yolo_config()
    _, yvars = init_yolo(ycfg, seed=0)
    return YoloService(cfg=ycfg, variables=yvars)


class TestTiling:
    def test_grid_covers_frame(self):
        from avede_tpu.ops.tiling import tile_grid

        offs = tile_grid(2160, 4096, 640, 128)
        ys = {y for y, x in offs}
        xs = {x for y, x in offs}
        assert max(ys) + 640 >= 2160
        assert max(xs) + 640 >= 4096
        assert 0 in ys and 0 in xs

    def test_tile_and_untile_roundtrip(self):
        from avede_tpu.ops.tiling import tile_frame, untile_boxes

        frame = np.random.default_rng(0).integers(
            0, 255, (300, 500, 3), dtype=np.uint8)
        tiles, offsets = tile_frame(frame, 256, 64)
        assert tiles.shape[1:] == (256, 256, 3)
        # a box at tile-local (10,10)-(20,20) in tile t maps back
        boxes = np.zeros((len(offsets), 1, 4), np.float32)
        boxes[:, 0] = [10, 10, 20, 20]
        mapped = untile_boxes(boxes, offsets)
        for t, (y, x) in enumerate(offsets):
            np.testing.assert_allclose(mapped[t, 0],
                                       [10 + x, 10 + y, 20 + x, 20 + y])

    def test_small_frame_padded(self):
        from avede_tpu.ops.tiling import tile_frame

        frame = np.ones((100, 120, 3), np.uint8)
        tiles, offsets = tile_frame(frame, 256, 64)
        assert tiles.shape == (1, 256, 256, 3)


class TestRegionProposals:
    def test_saliency_finds_bright_square(self):
        from avede_tpu.services.region_proposals import \
            RegionProposalService

        frame = np.full((120, 160, 3), 30, np.uint8)
        frame[40:60, 70:90] = 255
        props = RegionProposalService().generate_proposals(frame)
        assert props, "bright square must produce proposals"
        # some proposal must overlap the square region (spectral
        # residual is edge-seeking, so the best hit may be edge-typed)
        assert any(p["bbox"][0] < 90 and p["bbox"][2] > 70
                   and p["bbox"][1] < 60 and p["bbox"][3] > 40
                   for p in props)

    def test_motion_proposals_on_second_frame(self):
        from avede_tpu.services.region_proposals import \
            RegionProposalService

        svc = RegionProposalService()
        a = np.full((120, 160, 3), 64, np.uint8)
        b = a.copy()
        b[30:50, 40:60] = 220
        svc.generate_proposals(a)
        props = svc.generate_proposals(b)
        assert any(p["type"] == "motion" for p in props)

    def test_temporal_boost(self):
        from avede_tpu.services.region_proposals import \
            RegionProposalService

        svc = RegionProposalService()
        frame = np.full((120, 160, 3), 30, np.uint8)
        frame[40:60, 70:90] = 255
        svc.generate_proposals(frame)
        props = svc.generate_proposals(frame)
        assert any(p.get("temporally_consistent") for p in props)


class TestPersonService:
    def test_reference_processing_and_similarity(self, engine, tiny_yolo):
        from avede_tpu.services.person_detector import PersonDetector

        det = PersonDetector(engine, yolo=tiny_yolo)
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (96, 64, 3), dtype=np.uint8)
        ref = det.process_reference(img)
        assert ref["body"] is not None and ref["visual"] is not None
        sims = det.similarity(ref, ref)
        assert sims["similarity"] == pytest.approx(1.0, abs=1e-4)

    def test_video_search_end_to_end(self, engine, tiny_yolo, test_video):
        from avede_tpu.services.person_detector import (PersonDetector,
                                                        PersonSearchService)

        svc = PersonSearchService(
            engine, detector=PersonDetector(engine, yolo=tiny_yolo))
        ref = np.random.default_rng(1).integers(
            0, 255, (96, 64, 3), dtype=np.uint8)
        progress = []
        out = svc.process_video_for_person(
            test_video, ref, similarity_threshold=-1.0, frame_skip=10,
            progress_callback=progress.append)
        assert {"matches", "total_found", "summary"} <= set(out)
        assert out["summary"]["frames_processed"] == 8
        assert progress and progress[-1] == 1.0

    def test_stop_event_mid_stream(self, engine, tiny_yolo, test_video):
        """stop() during the streaming scan must terminate promptly with
        partial results — and drain the decode worker threads rather
        than leaving them blocked on their span queues."""
        import threading

        from avede_tpu.services.person_detector import (PersonDetector,
                                                        PersonSearchService)

        svc = PersonSearchService(
            engine, detector=PersonDetector(engine, yolo=tiny_yolo))
        ref = np.random.default_rng(1).integers(
            0, 255, (96, 64, 3), dtype=np.uint8)

        calls = []

        def stop_after_first(frac):
            calls.append(frac)
            svc.stop()

        before = {t.name for t in threading.enumerate()}
        expected = svc.reader.expected_sample_count(test_video,
                                                    sample_rate=2)
        out = svc.process_video_for_person(
            test_video, ref, similarity_threshold=-1.0, frame_skip=2,
            batch_size=4, progress_callback=stop_after_first)
        # stop is PROMPT: the scan abandons the decode stream instead
        # of draining it (round-3 advisor: the drain charged stop()
        # the full remaining decode wall)
        assert out["summary"]["frames_processed"] < expected
        assert len(calls) == 1          # processing stopped after batch 1
        # abandoned decode threads unblock via the cancel flag and exit
        # (bounded-queue puts re-check it every 0.1 s)
        import time

        deadline = time.time() + 5.0
        while time.time() < deadline:
            leaked = {t.name for t in threading.enumerate()} - before
            if not {n for n in leaked if n.startswith("avede-decode")}:
                break
            time.sleep(0.05)
        leaked = {t.name for t in threading.enumerate()} - before
        assert not {n for n in leaked if n.startswith("avede-decode")}

    def test_export_json_csv(self, engine, tiny_yolo, tmp_path):
        from avede_tpu.services.person_detector import (PersonDetector,
                                                        PersonSearchService)

        svc = PersonSearchService(
            engine, detector=PersonDetector(engine, yolo=tiny_yolo))
        results = {"matches": [{"timestamp": 1.0, "frame_index": 2,
                                "similarity": 0.8, "face_similarity": 0.7,
                                "body_similarity": 0.9,
                                "visual_similarity": 0.5,
                                "bbox": [1, 2, 3, 4]}]}
        j = svc.export_results(results, str(tmp_path / "r.json"), "json")
        c = svc.export_results(results, str(tmp_path / "r.csv"), "csv")
        import json as jsonlib

        assert jsonlib.loads(open(j).read())["matches"]
        assert "timestamp" in open(c).read()

    def test_temporal_filter_drops_outliers(self, engine, tiny_yolo):
        from avede_tpu.services.person_detector import (PersonMatch,
                                                        PersonSearchService)

        mk = lambda t, s: PersonMatch(t, int(t), [0, 0, 1, 1], s, s, s, s,
                                      "yolo")
        matches = [mk(float(i), 0.9) for i in range(6)] + [mk(6.0, 0.2)]
        kept = PersonSearchService._temporal_filter(matches)
        assert all(m.similarity > 0.2 for m in kept)


class TestSmallObject:
    def test_detect_in_video(self, engine, test_video):
        from avede_tpu.services.small_object import SmallObjectService
        from avede_tpu.services.universal_detector import UniversalDetector
        from avede_tpu.models.owlvit import init_owlvit, tiny_owlvit_config

        ocfg = tiny_owlvit_config()
        _, oparams = init_owlvit(ocfg, seed=0)
        ud = UniversalDetector(engine, owlvit_cfg=ocfg,
                               owlvit_params=oparams)
        svc = SmallObjectService(engine, detector=ud, tile=64, overlap=16)
        out = svc.detect_in_video(
            test_video, ["white square"], min_object_size=2,
            max_object_size=64, confidence_threshold=-1.0,
            sample_rate=25, enable_background_independence=False)
        assert {"results", "small_objects_found",
                "enhancement_stats"} <= set(out)
        assert out["enhancement_stats"]["tiles_processed"] > 0
        for r in out["results"]:
            assert 2 <= r["object_size"] <= 64


class TestBackgroundIndependent:
    def test_grabcut_and_shape(self):
        from avede_tpu.services.background_independent import (
            grabcut_mask, shape_descriptor)

        img = np.full((80, 80, 3), 20, np.uint8)
        img[20:60, 25:55] = [200, 40, 40]
        mask = grabcut_mask(img, [22, 18, 58, 62])
        assert mask is not None and mask.any()
        desc = shape_descriptor(mask)
        assert desc.shape == (20,) and desc[0] > 0

    def test_same_object_different_background(self, engine):
        """Core capability target: 0% → working (BASELINE.md)."""
        from avede_tpu.services.background_independent import \
            BackgroundIndependentService

        svc = BackgroundIndependentService(engine)
        obj = np.random.default_rng(3).integers(
            100, 255, (40, 30, 3), dtype=np.uint8)
        a = np.full((80, 80, 3), 10, np.uint8)
        b = np.random.default_rng(4).integers(0, 80, (80, 80, 3),
                                              dtype=np.uint8)
        a[20:60, 25:55] = obj
        b[20:60, 25:55] = obj
        fa = svc.extract_features(a, [25, 20, 55, 60])
        fb = svc.extract_features(b, [25, 20, 55, 60])
        other = svc.extract_features(
            np.random.default_rng(5).integers(0, 255, (80, 80, 3),
                                              dtype=np.uint8),
            [25, 20, 55, 60])
        s_same = svc.feature_similarity(fa, fb)
        s_diff = svc.feature_similarity(fa, other)
        assert s_same > s_diff

    def test_match_in_video(self, engine, test_video):
        from avede_tpu.services.background_independent import \
            BackgroundIndependentService
        from avede_tpu.services.universal_detector import UniversalDetector
        from avede_tpu.models.owlvit import init_owlvit, tiny_owlvit_config

        ocfg = tiny_owlvit_config()
        _, oparams = init_owlvit(ocfg, seed=0)
        ud = UniversalDetector(engine, owlvit_cfg=ocfg,
                               owlvit_params=oparams)
        svc = BackgroundIndependentService(engine)
        out = svc.match_in_video(test_video, ["white square"],
                                 confidence_threshold=-1.0,
                                 sample_rate=25, detector=ud)
        assert {"results", "background_independence_stats"} <= set(out)
        assert out["background_independence_stats"]["candidates"] >= 0

    def test_effnet_reid_features(self, engine, tmp_path, monkeypatch):
        """settings.FEATURE_EXTRACTOR_WEIGHTS wires EfficientNet re-ID
        features into the background-independent fusion (reference
        object_detector.py:171-196 role)."""
        from avede_tpu.models.convert import save_params
        from avede_tpu.models.effnet import init_effnet, tiny_effnet_config
        from avede_tpu.services.background_independent import (
            BackgroundIndependentService, EffNetExtractor)
        from avede_tpu.utils.config import settings

        cfg = tiny_effnet_config()
        _, variables = init_effnet(cfg, seed=0, image_size=64)
        wpath = tmp_path / "effnet.npz"
        save_params(variables, str(wpath))
        monkeypatch.setattr(settings, "FEATURE_EXTRACTOR_WEIGHTS",
                            str(wpath))
        svc = BackgroundIndependentService(
            engine, effnet=EffNetExtractor(weights_path=str(wpath),
                                           cfg=cfg, image_size=64))
        # loading through settings alone must also construct
        assert BackgroundIndependentService(engine).effnet is not None

        img = np.full((80, 80, 3), 10, np.uint8)
        img[20:60, 25:55] = np.random.default_rng(3).integers(
            100, 255, (40, 30, 3), dtype=np.uint8)
        feat = svc.extract_features(img, [25, 20, 55, 60])
        assert feat is not None and "effnet" in feat
        # random-init features are tiny, so the L2 guard epsilon shows
        # up in the norm — near-unit is the contract
        assert 0.9 < np.linalg.norm(feat["effnet"]) <= 1.0 + 1e-5
        s_self = svc.feature_similarity(feat, feat)
        assert s_self == pytest.approx(1.0, abs=1e-4)


class TestFindPersonInFrame:
    def test_single_frame_matcher(self, engine, tiny_yolo):
        from avede_tpu.services.person_detector import PersonDetector

        det = PersonDetector(engine, yolo=tiny_yolo)
        rng = np.random.default_rng(7)
        ref_img = rng.integers(0, 255, (96, 64, 3), dtype=np.uint8)
        ref = det.process_reference(ref_img)
        frame = rng.integers(0, 255, (96, 64, 3), dtype=np.uint8)
        out = det.find_person_in_frame(frame, ref, threshold=-1.0)
        for m in out:
            assert {"bbox", "similarity", "face_similarity"} <= set(m)
