"""Detection service tests with tiny models over synthetic frames."""

import numpy as np
import pytest

from tests.conftest import make_test_video


@pytest.fixture(scope="module")
def tiny_universal():
    """UniversalDetector wired entirely with tiny models."""
    import jax

    from avede_tpu.models.clip import init_clip, tiny_test_config
    from avede_tpu.models.owlvit import init_owlvit, tiny_owlvit_config
    from avede_tpu.models.yolo import init_yolo, tiny_yolo_config
    from avede_tpu.parallel.embed import ClipEngine
    from avede_tpu.parallel.mesh import build_mesh
    from avede_tpu.services.detector import YoloService
    from avede_tpu.services.universal_detector import UniversalDetector

    model, params = init_clip(tiny_test_config(), seed=0)
    engine = ClipEngine(cfg=tiny_test_config(), params=params,
                        mesh=build_mesh(jax.devices()[:1]))
    ocfg = tiny_owlvit_config()
    omodel, oparams = init_owlvit(ocfg, seed=0)
    ycfg = tiny_yolo_config()
    ymodel, yvars = init_yolo(ycfg, seed=0)
    yolo = YoloService(cfg=ycfg, variables=yvars)
    return UniversalDetector(engine, owlvit_cfg=ocfg,
                             owlvit_params=oparams, yolo=yolo)


@pytest.fixture(scope="module")
def frames():
    return np.random.default_rng(0).integers(
        0, 255, (4, 48, 64, 3), dtype=np.uint8)


class TestAdaptiveThresholds:
    def test_size_categories(self):
        from avede_tpu.services.adaptive_threshold import \
            AdaptiveThresholdSystem

        ats = AdaptiveThresholdSystem()
        assert ats.size_category(10 * 10) == "tiny"
        assert ats.size_category(20 * 20) == "small"
        assert ats.size_category(64 * 64) == "medium"
        assert ats.size_category(200 * 200) == "large"

    def test_small_objects_get_lower_threshold_and_boost(self):
        from avede_tpu.services.adaptive_threshold import \
            AdaptiveThresholdSystem

        ats = AdaptiveThresholdSystem()
        tiny = ats.calculate_threshold(bbox=[0, 0, 8, 8])
        large = ats.calculate_threshold(bbox=[0, 0, 300, 300])
        assert tiny.threshold < large.threshold
        assert tiny.confidence_boost > large.confidence_boost

    def test_context_adjustments(self):
        from avede_tpu.services.adaptive_threshold import (
            AdaptiveThresholdSystem, DetectionContext)

        ats = AdaptiveThresholdSystem()
        noisy = DetectionContext(noise_level=0.9, brightness=0.1)
        base = ats.calculate_threshold(size_category="medium")
        hard = ats.calculate_threshold(size_category="medium", context=noisy)
        assert hard.threshold > base.threshold
        assert "noise" in hard.adjustments and "lighting" in hard.adjustments

    def test_apply_filters_and_boosts(self):
        from avede_tpu.services.adaptive_threshold import \
            AdaptiveThresholdSystem

        ats = AdaptiveThresholdSystem()
        dets = [
            {"bbox": [0, 0, 8, 8], "confidence": 0.08},      # tiny, >0.05
            {"bbox": [0, 0, 8, 8], "confidence": 0.02},      # below
            {"bbox": [0, 0, 300, 300], "confidence": 0.45},  # large
        ]
        out = ats.apply(dets)
        assert len(out) == 2
        tiny = next(d for d in out if d["size_category"] == "tiny")
        assert tiny["confidence"] == pytest.approx(0.16)  # 2× boost

    def test_optimize_from_history(self):
        from avede_tpu.services.adaptive_threshold import \
            AdaptiveThresholdSystem

        ats = AdaptiveThresholdSystem()
        rng = np.random.default_rng(0)
        for _ in range(150):
            conf = float(rng.uniform(0, 1))
            ats.record_outcome("small", conf, was_correct=conf > 0.4)
        learned = ats.optimize(min_samples=100)
        assert "small" in learned
        assert learned["small"] > 0.1

    def test_context_from_frame(self, frames):
        from avede_tpu.services.adaptive_threshold import DetectionContext

        ctx = DetectionContext.from_frame(frames[0], frames[1])
        assert 0 <= ctx.brightness <= 1
        assert ctx.motion_level > 0  # random frames differ


class TestUniversalDetector:
    def test_owlvit_mode(self, tiny_universal, frames):
        dets = tiny_universal.detect_unlimited_objects(
            frames, ["a red ball"], detection_mode="owlvit",
            conf_threshold=0.0, adaptive=False)
        assert len(dets) == len(frames)
        for frame_dets in dets:
            for d in frame_dets:
                assert d["method"] == "owlvit"
                assert len(d["bbox"]) == 4
                assert d["query"] == "a red ball"

    def test_clip_mode(self, tiny_universal, frames):
        dets = tiny_universal.detect_unlimited_objects(
            frames, ["thing", "other"], detection_mode="clip",
            conf_threshold=-1.0, adaptive=False)
        # every cell scores against 2 queries; with thr=-1 all surface
        assert all(len(d) > 0 for d in dets)
        assert dets[0][0]["method"] == "clip_grid"

    def test_yolo_enhanced_mode(self, tiny_universal, frames):
        dets = tiny_universal.detect_unlimited_objects(
            frames, ["object"], detection_mode="yolo_enhanced",
            conf_threshold=0.0, adaptive=False)
        assert len(dets) == len(frames)

    def test_hybrid_merges(self, tiny_universal, frames):
        dets = tiny_universal.detect_unlimited_objects(
            frames[:2], ["thing"], detection_mode="hybrid",
            conf_threshold=0.0, adaptive=False)
        assert len(dets) == 2

    def test_unknown_mode_raises(self, tiny_universal, frames):
        with pytest.raises(ValueError, match="unknown detection mode"):
            tiny_universal.detect_unlimited_objects(
                frames, ["x"], detection_mode="bogus")

    def test_merge_detections_dedup(self):
        from avede_tpu.services.universal_detector import merge_detections

        dets = [
            {"bbox": [0, 0, 10, 10], "confidence": 0.9, "query": "a"},
            {"bbox": [1, 1, 11, 11], "confidence": 0.5, "query": "a"},
            {"bbox": [1, 1, 11, 11], "confidence": 0.5, "query": "b"},
        ]
        out = merge_detections(dets)
        assert len(out) == 2  # same-query overlap removed, cross-query kept


class TestOpenVocabMatcher:
    def test_video_matching_end_to_end(self, tiny_universal, test_video):
        from avede_tpu.services.open_vocab_matcher import OpenVocabMatcher

        m = OpenVocabMatcher(tiny_universal.engine,
                             detector=tiny_universal)
        out = m.match_unlimited_objects(
            test_video, ["white square"], detection_mode="clip",
            matching_precision="comprehensive", top_k=5,
            confidence_threshold=-1.0, sample_rate=10)
        assert "results" in out and "metadata" in out
        assert out["metadata"]["frames_processed"] > 0
        for r in out["results"]:
            assert {"bbox", "timestamp", "composite_score",
                    "visual_quality", "semantic_relevance",
                    "size_score"} <= set(r)

    def test_sample_rate_is_supported(self, tiny_universal, test_video):
        """Reference bug §2.6.8: sample_rate kwarg crashed the whole
        path. Here it must work."""
        from avede_tpu.services.open_vocab_matcher import OpenVocabMatcher

        m = OpenVocabMatcher(tiny_universal.engine,
                             detector=tiny_universal)
        out = m.match_unlimited_objects(
            test_video, ["x"], detection_mode="clip", sample_rate=25,
            confidence_threshold=-1.0)
        assert out["metadata"]["frames_processed"] == 3

    def test_dedup_window(self):
        from avede_tpu.services.open_vocab_matcher import OpenVocabMatcher

        results = [
            {"bbox": [0, 0, 10, 10], "timestamp": 1.0, "query": "a",
             "composite_score": 0.9},
            {"bbox": [0, 0, 10, 10], "timestamp": 2.0, "query": "a",
             "composite_score": 0.5},   # dup: same box, Δt=1 ≤ 2
            {"bbox": [0, 0, 10, 10], "timestamp": 9.0, "query": "a",
             "composite_score": 0.4},   # far in time → kept
        ]
        out = OpenVocabMatcher._deduplicate(results)
        assert len(out) == 2

    def test_query_suggestions(self, tiny_universal):
        from avede_tpu.services.open_vocab_matcher import OpenVocabMatcher

        m = OpenVocabMatcher(tiny_universal.engine,
                             detector=tiny_universal)
        assert len(m.suggest_queries()) == 10
        assert all("car" in s for s in m.suggest_queries("car"))
