"""BLIP-2 Q-Former retrieval parity vs HF Blip2ForImageTextRetrieval."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def pair():
    from transformers import Blip2Config as HFConfig
    from transformers import Blip2ForImageTextRetrieval as HFModel

    from avede_tpu.models.qformer import (Blip2Retrieval,
                                          convert_blip2_state_dict,
                                          tiny_qformer_config)

    hf_cfg = HFConfig(
        vision_config=dict(hidden_size=64, intermediate_size=128,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=32, patch_size=8),
        qformer_config=dict(hidden_size=64, intermediate_size=128,
                            num_hidden_layers=2, num_attention_heads=4,
                            vocab_size=100, max_position_embeddings=32,
                            encoder_hidden_size=64,
                            cross_attention_frequency=2,
                            use_qformer_text_input=True),
        text_config=dict(vocab_size=100),
        num_query_tokens=4, image_text_hidden_size=24)
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()
    cfg = tiny_qformer_config()
    params = convert_blip2_state_dict(hf.state_dict(), cfg)
    return hf, Blip2Retrieval(cfg), params, cfg


class TestQFormerParity:
    def test_itc_logits_match(self, pair):
        hf, model, params, cfg = pair
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
        ids = rng.integers(1, 90, size=(3, 6)).astype(np.int64)

        with torch.no_grad():
            out = hf(pixel_values=torch.tensor(x.transpose(0, 3, 1, 2)),
                     input_ids=torch.tensor(ids),
                     attention_mask=torch.ones_like(torch.tensor(ids)),
                     use_image_text_matching_head=False)
            ref = out.logits_per_image.numpy()
        got = model.apply({"params": params}, x, ids.astype(np.int32),
                          np.ones_like(ids, bool))
        assert np.asarray(got).shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4)

    def test_image_embeds_normalized(self, pair):
        hf, model, params, cfg = pair
        x = np.random.default_rng(1).normal(
            size=(2, 32, 32, 3)).astype(np.float32)
        emb = model.apply({"params": params}, x,
                          method=model.image_embeds)
        assert emb.shape == (2, cfg.num_query_tokens, cfg.projection_dim)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-5)

    def test_jittable_rerank_scores(self, pair):
        import jax

        hf, model, params, cfg = pair
        x = np.random.default_rng(2).normal(
            size=(4, 32, 32, 3)).astype(np.float32)
        ids = np.random.default_rng(3).integers(
            1, 90, size=(1, 6)).astype(np.int32)
        fn = jax.jit(lambda p, px, i: model.apply({"params": p}, px, i))
        scores = np.asarray(fn(params, x, ids))
        assert scores.shape == (4, 1)
        assert np.isfinite(scores).all()


class TestBlip2Rerank:
    def test_phase2_with_blip2_reranker(self, pair, tmp_path):
        """Phase 2 rerank driven by Q-Former ITC scores."""
        import jax

        from tests.conftest import make_test_video
        from avede_tpu.io.embedding_cache import EmbeddingCache
        from avede_tpu.models.clip import init_clip, tiny_test_config
        from avede_tpu.parallel.embed import ClipEngine
        from avede_tpu.parallel.mesh import build_mesh
        from avede_tpu.pipelines.phase1 import Phase1Scan
        from avede_tpu.pipelines.phase2 import Phase2Rerank
        from avede_tpu.services.captioner import Blip2RerankService

        hf, model, params, cfg = pair
        video = make_test_video(tmp_path / "v.mp4")
        cmodel, cparams = init_clip(tiny_test_config(), seed=0)
        engine = ClipEngine(cfg=tiny_test_config(), params=cparams,
                            mesh=build_mesh(jax.devices()[:1]))
        p1 = Phase1Scan(engine, cache=EmbeddingCache(str(tmp_path / "e")))
        b2 = Blip2RerankService(cfg=cfg, params=params)
        p2 = Phase2Rerank(p1, captioner=b2)
        out = p2.process_video(video, "white square", top_k=3,
                               threshold=-1.0)
        assert out
        for r in out:
            assert "itc_score" in r
            assert r["phase"] == "phase2_reranked"

    def test_split_rerank_matches_fused_itc(self, pair):
        """frame_repr + scores_from_repr (the cacheable split) must
        reproduce the fused ITC forward exactly."""
        import jax.numpy as jnp

        from avede_tpu.services.captioner import Blip2RerankService

        hf, model, params, cfg = pair
        b2 = Blip2RerankService(cfg=cfg, params=params)
        rng = np.random.default_rng(3)
        frames = rng.integers(0, 255, (3, 32, 32, 3), np.uint8)
        query = "a white square"
        split_scores, _ = b2.rerank_scores(frames, query)

        from avede_tpu.ops.preprocess import blip_preprocess
        ids_list = b2.tokenizer.encode(query)[:30]
        ids = np.asarray([[101] + ids_list + [102]], np.int32)
        fused = np.asarray(model.apply(
            {"params": params},
            blip_preprocess(jnp.asarray(frames), size=cfg.image_size),
            jnp.asarray(ids), jnp.asarray(np.ones_like(ids, bool))))[:, 0]
        np.testing.assert_allclose(split_scores, fused, atol=1e-5)
