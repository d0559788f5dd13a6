"""The trained face path (round-3 verdict item 4): synthetic face
ground truth, the face-region detector wiring, the face embedding cue,
and the two-cue fusion inside PersonDetector.similarity."""

import numpy as np
import pytest


class TestSyntheticFaces:
    def test_parts_face_box_inside_person(self):
        from avede_tpu.utils.synthetic import draw_person, make_identity

        rng = np.random.default_rng(0)
        for _ in range(5):
            parts = {}
            frame, bbox = draw_person(make_identity(rng), rng,
                                      parts=parts)
            fx0, fy0, fx1, fy1 = parts["face"]
            x0, y0, x1, y1 = bbox
            assert x0 - 1 <= fx0 < fx1 <= x1 + 1
            assert y0 - 1 <= fy0 < fy1 <= y1 + 1
            # the face is the head: top ~quarter of the person box
            assert fy1 <= y0 + (y1 - y0) * 0.35

    def test_face_detector_scene_contract(self):
        from avede_tpu.utils.synthetic import face_detector_scene

        rng = np.random.default_rng(1)
        img, boxes, labels, mask = face_detector_scene(rng)
        assert img.shape == (64, 64, 3) and img.dtype == np.uint8
        assert boxes.shape == (1, 4) and mask.shape == (1,)
        if mask[0]:
            x0, y0, x1, y1 = boxes[0]
            assert 0 <= x0 < x1 <= 64 and 0 <= y0 < y1 <= 64

    def test_face_batch_shapes_and_alignment(self):
        from avede_tpu.utils.synthetic import face_batch, make_identity

        rng = np.random.default_rng(2)
        ids = [make_identity(rng) for _ in range(6)]
        a, b = face_batch(ids, rng, crop_size=32)
        assert a.shape == b.shape == (6, 32, 32, 3)
        assert a.dtype == np.float32 and 0.0 <= a.min() <= a.max() <= 1.0


class TestFaceFusion:
    def _det(self, engine):
        from avede_tpu.services.person_detector import PersonDetector

        class _NoYolo:      # similarity() never touches the detector
            pass

        return PersonDetector(engine, yolo=_NoYolo())

    def test_two_cue_face_term_is_mean(self, tiny_clip):
        from avede_tpu.models.clip import tiny_test_config
        from avede_tpu.parallel.embed import ClipEngine

        _, params = tiny_clip
        det = self._det(ClipEngine(cfg=tiny_test_config(),
                                   params=params))
        e = np.eye(4, dtype=np.float32)
        # identity agrees (cos 1), face disagrees (cos 0): with
        # CONFIDENT face boxes on both sides the face cue fully
        # participates, (1 + 1*0)/(1+1) = 0.5
        ref = {"identity": e[0], "face": e[1], "body": None,
               "visual": None, "face_conf": 1.0}
        cand = {"identity": e[0], "face": e[2], "body": None,
                "visual": None, "face_conf": 1.0}
        sims = det.similarity(ref, cand)
        assert sims["face_similarity"] == pytest.approx(0.5)
        assert sims["similarity"] == pytest.approx(0.5)
        # low-confidence candidate box → the face cosine is a
        # comparison of wrong crops; the cue fades toward identity
        cand_low = dict(cand, face_conf=0.0)
        sims = det.similarity(ref, cand_low)
        assert sims["face_similarity"] == pytest.approx(1.0)
        # legacy feature dicts without face_conf behave like w=0
        ref.pop("face_conf"), cand.pop("face_conf")
        sims = det.similarity(ref, cand)
        assert sims["face_similarity"] == pytest.approx(1.0)

    def test_single_cue_degrades_gracefully(self, tiny_clip):
        from avede_tpu.models.clip import tiny_test_config
        from avede_tpu.parallel.embed import ClipEngine

        _, params = tiny_clip
        det = self._det(ClipEngine(cfg=tiny_test_config(),
                                   params=params))
        v = np.ones(4, np.float32)
        only_identity = det.similarity(
            {"identity": v, "face": None}, {"identity": v, "face": None})
        only_face = det.similarity(
            {"identity": None, "face": v}, {"identity": None, "face": v})
        assert only_identity["face_similarity"] == pytest.approx(1.0)
        assert only_face["face_similarity"] == pytest.approx(1.0)

    def test_trained_face_detector_wiring(self, tiny_clip):
        """A (random-init) face YOLO above threshold routes find_faces
        through the trained path and yields a valid in-frame box; the
        geometric estimate remains the fallback."""
        from avede_tpu.models.clip import tiny_test_config
        from avede_tpu.models.yolo import YoloConfig, init_yolo
        from avede_tpu.parallel.embed import ClipEngine
        from avede_tpu.services.detector import YoloService
        from avede_tpu.services.person_detector import (PersonDetector,
                                                        face_region)

        _, params = tiny_clip
        engine = ClipEngine(cfg=tiny_test_config(), params=params)
        fcfg = YoloConfig(num_classes=1, scale="n", img_size=64)
        fmodel, fvars = init_yolo(fcfg, seed=0)
        fy = YoloService(cfg=fcfg, variables=fvars,
                         class_names=["face"])

        class _NoYolo:
            pass

        det = PersonDetector(engine, yolo=_NoYolo(), face_yolo=fy)
        frame = np.random.default_rng(0).integers(
            0, 255, (96, 96, 3), np.uint8)
        pb = [20.0, 10.0, 60.0, 90.0]
        fb = det.find_faces(frame, pb)
        assert len(fb) == 4 and fb[0] < fb[2] and fb[1] < fb[3]
        # whatever path fired, the box starts inside the person region
        assert fb[0] >= pb[0] - 1 and fb[1] >= pb[1] - 1
        # without any detector the geometric fallback is exact
        det2 = PersonDetector(engine, yolo=_NoYolo())
        assert det2.find_faces(frame, pb) == face_region(pb)

    def test_face_embedder_populates_face_slot(self, tiny_clip):
        from avede_tpu.models.appearance import (AppearanceConfig,
                                                 AppearanceEmbedder)
        from avede_tpu.models.clip import tiny_test_config
        from avede_tpu.parallel.embed import ClipEngine
        from avede_tpu.services.person_detector import PersonDetector

        _, params = tiny_clip
        engine = ClipEngine(cfg=tiny_test_config(), params=params)
        fcfg = AppearanceConfig(input_size=32, widths=(8, 16, 16, 32),
                                embed_dim=16)
        emb = AppearanceEmbedder(fcfg)

        class _NoYolo:
            pass

        det = PersonDetector(engine, yolo=_NoYolo(), face_embedder=emb)
        frame = np.random.default_rng(1).integers(
            0, 255, (96, 96, 3), np.uint8)
        feats = det.extract_features(frame, [[20.0, 10.0, 60.0, 90.0]])
        assert feats[0]["face"] is not None
        assert feats[0]["face"].shape == (16,)
        assert feats[0]["identity"] is None   # no appearance encoder


class TestFusionWeights:
    """Learned score-level fusion (``fit_fusion_weights``) and the
    injectable ``PersonDetector.fusion_weights`` it feeds."""

    def test_fit_recovers_informative_cue(self):
        from avede_tpu.services.person_detector import fit_fusion_weights

        rng = np.random.default_rng(0)
        labels = rng.random(200) < 0.3
        # face separates the classes; body/visual are pure noise
        sims = [{"face": (0.8 if lab else 0.1)
                 + float(rng.normal(0, 0.05)),
                 "body": float(rng.random()),
                 "visual": float(rng.random())} for lab in labels]
        w = fit_fusion_weights(sims, labels)
        assert w["face"] > 0.8
        assert sum(w.values()) == pytest.approx(1.0)

    def test_fit_degenerate_returns_settings_default(self):
        from avede_tpu.services.person_detector import fit_fusion_weights
        from avede_tpu.utils.config import settings

        default = dict(settings.PERSON_FEATURE_WEIGHTS)
        assert fit_fusion_weights([], []) == default
        one_class = [{"face": 0.5, "body": 0.4, "visual": 0.3}] * 4
        assert fit_fusion_weights(one_class, [True] * 4) == default

    def test_detector_honors_injected_weights(self, tiny_clip):
        from avede_tpu.models.clip import tiny_test_config
        from avede_tpu.parallel.embed import ClipEngine
        from avede_tpu.services.person_detector import PersonDetector
        from avede_tpu.utils.config import settings

        _, params = tiny_clip
        engine = ClipEngine(cfg=tiny_test_config(), params=params)

        class _NoYolo:
            pass

        # default comes from settings (the reference's 0.6/0.3/0.1)
        det = PersonDetector(engine, yolo=_NoYolo())
        assert det.fusion_weights == dict(settings.PERSON_FEATURE_WEIGHTS)

        e = np.eye(3, dtype=np.float32)
        ref = {"identity": e[0], "face": None, "body": e[1],
               "visual": None}
        cand = {"identity": e[0], "face": None, "body": e[2],
                "visual": None}
        face_only = PersonDetector(
            engine, yolo=_NoYolo(),
            fusion_weights={"face": 1.0, "body": 0.0, "visual": 0.0})
        body_only = PersonDetector(
            engine, yolo=_NoYolo(),
            fusion_weights={"face": 0.0, "body": 1.0, "visual": 0.0})
        # identity cues agree (face term 1), body cues orthogonal (0):
        # the injected weights decide which one the fused score follows
        assert face_only.similarity(ref, cand)["similarity"] == \
            pytest.approx(1.0)
        assert body_only.similarity(ref, cand)["similarity"] == \
            pytest.approx(0.0)

    def test_four_way_weights_split_identity_from_face(self, tiny_clip):
        """With an 'identity' key the mix weighs the raw cues — a
        fitter can zero the face embedding without losing identity —
        and the detector-confidence fade scales the face weight."""
        from avede_tpu.models.clip import tiny_test_config
        from avede_tpu.parallel.embed import ClipEngine
        from avede_tpu.services.person_detector import PersonDetector

        _, params = tiny_clip
        engine = ClipEngine(cfg=tiny_test_config(), params=params)

        class _NoYolo:
            pass

        e = np.eye(4, dtype=np.float32)
        # identity agrees (cos 1); face embedding disagrees (cos 0)
        ref = {"identity": e[0], "face": e[1], "body": None,
               "visual": None, "face_conf": 1.0}
        cand = {"identity": e[0], "face": e[2], "body": None,
                "visual": None, "face_conf": 1.0}
        id_only = PersonDetector(
            engine, yolo=_NoYolo(),
            fusion_weights={"identity": 1.0, "face": 0.0,
                            "body": 0.0, "visual": 0.0})
        assert id_only.similarity(ref, cand)["similarity"] == \
            pytest.approx(1.0)
        even = PersonDetector(
            engine, yolo=_NoYolo(),
            fusion_weights={"identity": 0.5, "face": 0.5,
                            "body": 0.0, "visual": 0.0})
        # confident face box: (0.5·1 + 0.5·0) / 1.0
        assert even.similarity(ref, cand)["similarity"] == \
            pytest.approx(0.5)
        # zero-confidence face box: the face weight fades away and
        # identity carries the whole score
        cand_low = dict(cand, face_conf=0.0)
        assert even.similarity(ref, cand_low)["similarity"] == \
            pytest.approx(1.0)
        # reported fields keep the reference schema (composite term)
        out = even.similarity(ref, cand)
        assert set(out) == {"similarity", "face_similarity",
                            "body_similarity", "visual_similarity"}

    def test_four_way_fit_zeroes_weak_face_cue(self):
        from avede_tpu.services.person_detector import fit_fusion_weights

        rng = np.random.default_rng(3)
        labels = rng.random(300) < 0.25
        sims = [{"identity": (0.9 if lab else 0.05)
                 + float(rng.normal(0, 0.04)),
                 "face": float(rng.random()),     # noise
                 "body": float(rng.random()),     # noise
                 "visual": float(rng.random())} for lab in labels]
        w = fit_fusion_weights(sims, labels,
                               keys=("identity", "face", "body",
                                     "visual"))
        assert w["identity"] > 0.8
        assert sum(w.values()) == pytest.approx(1.0)
