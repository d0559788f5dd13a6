"""Image-matching tests: classical features, cross-domain matcher, the
six-mode ImageMatcher, phase-4 pipeline."""

import numpy as np
import pytest

from tests.conftest import make_test_video


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    noisy = np.clip(base.astype(int)
                    + rng.integers(-10, 10, base.shape), 0, 255
                    ).astype(np.uint8)
    other = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    return base, noisy, other


class TestImageFeatures:
    def test_phash_similar_vs_different(self, imgs):
        from avede_tpu.ops import image_feats as F

        base, noisy, other = imgs
        d_same = F.hamming_distance(F.perceptual_hash(base),
                                    F.perceptual_hash(noisy))
        d_diff = F.hamming_distance(F.perceptual_hash(base),
                                    F.perceptual_hash(other))
        assert d_same < d_diff

    def test_ssim_identity_and_range(self, imgs):
        from avede_tpu.ops import image_feats as F

        base, noisy, other = imgs
        assert F.ssim(base, base) == pytest.approx(1.0, abs=1e-6)
        assert F.ssim(base, noisy) > F.ssim(base, other)

    def test_histogram_correlation(self, imgs):
        from avede_tpu.ops import image_feats as F

        base, noisy, other = imgs
        h = F.hsv_histogram(base)
        assert F.histogram_correlation(h, h) == pytest.approx(1.0)
        assert F.histogram_correlation(
            h, F.hsv_histogram(noisy)) > F.histogram_correlation(
            h, F.hsv_histogram(other))

    def test_lbp_and_hu_shapes(self, imgs):
        from avede_tpu.ops import image_feats as F

        base = imgs[0]
        assert F.lbp_histogram(base).shape == (26,)
        assert F.hu_moments(base).shape == (7,)
        assert F.edge_stats(base).shape == (4,)
        assert F.texture_stats(base).shape == (4,)

    def test_analyze_image_grayscale_flag(self):
        from avede_tpu.ops import image_feats as F

        gray3 = np.repeat(np.random.default_rng(1).integers(
            0, 255, (32, 32, 1), dtype=np.uint8), 3, axis=2)
        color = np.random.default_rng(2).integers(
            0, 255, (32, 32, 3), dtype=np.uint8)
        assert F.analyze_image(gray3)["is_grayscale"] == 1.0
        assert F.analyze_image(color)["is_grayscale"] == 0.0


class TestCrossDomain:
    def test_color_vs_grayscale_match(self, imgs):
        """The core capability: same content matches across color⇄gray."""
        import cv2
        from avede_tpu.services.cross_domain_matcher import \
            CrossDomainMatcher

        base, _, other = imgs
        gray = cv2.cvtColor(cv2.cvtColor(base, cv2.COLOR_RGB2GRAY),
                            cv2.COLOR_GRAY2RGB)
        m = CrossDomainMatcher()
        same = m.compute_similarity(base, gray)["combined"]
        diff = m.compute_similarity(base, other)["combined"]
        assert same > diff

    def test_match_against_frames(self, imgs):
        from avede_tpu.services.cross_domain_matcher import \
            CrossDomainMatcher

        base, noisy, other = imgs
        frames = np.stack([other, noisy, other])
        hits = CrossDomainMatcher().match_against_frames(
            base, frames, threshold=0.0)
        best = max(hits, key=lambda h: h["similarity"])
        assert best["frame_index"] == 1

    def test_batch_path_computes_second_orb_scale(self, imgs):
        """Regression: batch path must compute orb2 at the 1000-feature
        scale like compute_similarity, not duplicate orb (r1 weak #7)."""
        from avede_tpu.services.cross_domain_matcher import \
            CrossDomainMatcher

        base, noisy, other = imgs
        m = CrossDomainMatcher()
        hits = m.match_against_frames(base, np.stack([noisy, other]),
                                      threshold=0.0)
        ref = m.compute_similarity(base, noisy)
        got = next(h for h in hits if h["frame_index"] == 0)["breakdown"]
        assert got["orb"] == pytest.approx(ref["orb"], abs=1e-6)
        assert got["orb2"] == pytest.approx(ref["orb2"], abs=1e-6)


@pytest.fixture(scope="module")
def matcher_stack(tmp_path_factory):
    import jax

    from avede_tpu.models.clip import init_clip, tiny_test_config
    from avede_tpu.models.yolo import init_yolo, tiny_yolo_config
    from avede_tpu.io.embedding_cache import EmbeddingCache
    from avede_tpu.parallel.embed import ClipEngine
    from avede_tpu.parallel.mesh import build_mesh
    from avede_tpu.services.detector import YoloService
    from avede_tpu.services.image_matcher import ImageMatcher

    model, params = init_clip(tiny_test_config(), seed=0)
    engine = ClipEngine(cfg=tiny_test_config(), params=params,
                        mesh=build_mesh(jax.devices()[:1]))
    ycfg = tiny_yolo_config()
    _, yvars = init_yolo(ycfg, seed=0)
    yolo = YoloService(cfg=ycfg, variables=yvars)
    cache = EmbeddingCache(str(tmp_path_factory.mktemp("emb")))
    return ImageMatcher(engine, yolo=yolo, cache=cache)


@pytest.fixture(scope="module")
def video_and_ref(tmp_path_factory):
    import cv2

    path = make_test_video(tmp_path_factory.mktemp("v") / "vid.mp4")
    cap = cv2.VideoCapture(path)
    cap.set(cv2.CAP_PROP_POS_FRAMES, 37)
    ok, frame = cap.read()
    cap.release()
    ref = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
    return path, ref


class TestImageMatcher:
    @pytest.mark.parametrize("mode", ["fast_match", "traditional",
                                      "cross_domain", "object_focused",
                                      "hybrid", "smart_match"])
    def test_all_modes_run(self, matcher_stack, video_and_ref, mode):
        video, ref = video_and_ref
        out = matcher_stack.match_image_to_video(
            video, ref, mode=mode, threshold=0.0, top_k=5,
            video_id=f"v_{mode}")
        assert isinstance(out, list)
        for m in out:
            assert {"frame_index", "timestamp", "similarity",
                    "method"} <= set(m)

    def test_exact_frame_found_by_traditional(self, matcher_stack,
                                              video_and_ref):
        video, ref = video_and_ref
        out = matcher_stack.match_image_to_video(
            video, ref, mode="traditional", threshold=0.3, top_k=3,
            video_id="v_exact")
        assert out, "exact middle frame must match its own video"
        # the matched frame should be near the reference frame (t≈1.48s)
        assert abs(out[0]["timestamp"] - 1.48) < 0.5

    def test_unknown_mode_raises(self, matcher_stack, video_and_ref):
        video, ref = video_and_ref
        with pytest.raises(ValueError, match="unknown matching mode"):
            matcher_stack.match_image_to_video(video, ref, mode="nope")

    def test_result_cache(self, matcher_stack, video_and_ref):
        video, ref = video_and_ref
        a = matcher_stack.match_image_to_video(
            video, ref, mode="fast_match", threshold=0.0, video_id="vc")
        runs_before = matcher_stack.stats["matches_run"]
        b = matcher_stack.match_image_to_video(
            video, ref, mode="fast_match", threshold=0.0, video_id="vc")
        assert matcher_stack.stats["matches_run"] == runs_before
        assert [m["frame_index"] for m in a] == [m["frame_index"]
                                                for m in b]


class TestPhase4:
    def test_process_image_query(self, matcher_stack, video_and_ref,
                                 tmp_path):
        from avede_tpu.io.clip_writer import ClipWriter
        from avede_tpu.pipelines.phase4 import Phase4ImageMatching

        video, ref = video_and_ref
        p4 = Phase4ImageMatching(
            matcher_stack.engine, matcher=matcher_stack,
            clip_writer=ClipWriter(str(tmp_path / "clips")))
        out = p4.process_image_query(video, ref,
                                     matching_mode="traditional",
                                     similarity_threshold=0.2,
                                     video_id="v_p4")
        assert {"results", "clips", "total_found", "metadata",
                "performance"} <= set(out)
        if out["results"]:
            assert out["clips"], "clips must extract (ref bug §2.6.7 fixed)"
            import os

            assert os.path.exists(out["clips"][0]["clip_path"])
            assert 0 <= out["results"][0]["quality_score"] <= 1

    def test_compare_modes(self, matcher_stack, video_and_ref):
        from avede_tpu.pipelines.phase4 import Phase4ImageMatching

        video, ref = video_and_ref
        p4 = Phase4ImageMatching(matcher_stack.engine,
                                 matcher=matcher_stack)
        cmp = p4.compare_modes(video, ref,
                               modes=["fast_match", "traditional"],
                               video_id="v_cmp")
        assert set(cmp) == {"fast_match", "traditional"}
        assert all("best_similarity" in v for v in cmp.values())
