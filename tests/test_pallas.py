"""Pallas kernel parity tests (interpret mode on the CPU backend)."""

import numpy as np
import pytest


class TestFusedPatchEmbed:
    def test_matches_xla_reference(self):
        import jax.numpy as jnp
        from avede_tpu.ops.pallas_kernels import (fused_patch_embed,
                                                  patch_embed_reference)

        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (3, 64, 64, 3), dtype=np.uint8)
        kernel = rng.normal(0, 0.02, (16, 16, 3, 32)).astype(np.float32)
        bias = rng.normal(0, 0.01, (32,)).astype(np.float32)

        got = fused_patch_embed(jnp.asarray(frames), jnp.asarray(kernel),
                                jnp.asarray(bias), interpret=True)
        ref = patch_embed_reference(jnp.asarray(frames),
                                    jnp.asarray(kernel), jnp.asarray(bias))
        assert got.shape == (3, 16, 32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_fold_exactness(self):
        """The uint8 fold must be algebraically exact, not approximate."""
        import jax.numpy as jnp
        from avede_tpu.ops.pallas_kernels import fold_for_uint8
        from avede_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD

        rng = np.random.default_rng(1)
        kernel = rng.normal(size=(4, 4, 3, 8)).astype(np.float32)
        w2, b_delta = fold_for_uint8(jnp.asarray(kernel))
        patch = rng.integers(0, 255, (4, 4, 3)).astype(np.float32)
        x_norm = ((patch / 255.0 - CLIP_MEAN) / CLIP_STD).reshape(-1)
        ref = x_norm @ kernel.reshape(-1, 8)
        got = patch.reshape(-1) @ np.asarray(w2) + np.asarray(b_delta)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


class TestCosineScoresPallas:
    def test_matches_matmul(self):
        import jax.numpy as jnp
        from avede_tpu.ops.pallas_kernels import cosine_scores_pallas

        rng = np.random.default_rng(2)
        emb = rng.normal(size=(512, 64)).astype(np.float32)
        q = rng.normal(size=(64,)).astype(np.float32)
        got = cosine_scores_pallas(jnp.asarray(emb), jnp.asarray(q),
                                   interpret=True, block=128)
        np.testing.assert_allclose(np.asarray(got), emb @ q, atol=1e-4)


class TestFusedVisionPath:
    def test_fused_patches_match_conv_path(self, tiny_clip):
        """End-to-end: encode_image vs fused-kernel + from_patches."""
        import jax.numpy as jnp
        from avede_tpu.models.clip import tiny_test_config
        from avede_tpu.ops.pallas_kernels import fused_patch_embed
        from avede_tpu.ops.preprocess import (central_square_crop,
                                              clip_preprocess,
                                              resize_frames)

        model, params = tiny_clip
        cfg = tiny_test_config()
        rng = np.random.default_rng(5)
        frames = rng.integers(0, 255, (2, 40, 56, 3), dtype=np.uint8)

        px = clip_preprocess(jnp.asarray(frames), size=cfg.image_size)
        ref = model.apply({"params": params}, px,
                          method=model.encode_image)

        x = central_square_crop(jnp.asarray(frames)).astype(jnp.float32)
        x = resize_frames(x, cfg.image_size, "bicubic")
        k = params["vision"]["patch_embedding"]["kernel"]
        tokens = fused_patch_embed(
            x, k, jnp.zeros((k.shape[-1],), jnp.float32), interpret=True)
        got = model.apply({"params": params}, tokens,
                          method=model.encode_image_from_patches)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-3, atol=1e-3)


class TestQuantization:
    def test_roundtrip_error_bounded(self):
        import jax.numpy as jnp
        from avede_tpu.ops.quant import dequantize, quantize_per_channel

        rng = np.random.default_rng(0)
        w = rng.normal(0, 0.05, (64, 32)).astype(np.float32)
        q, s = quantize_per_channel(jnp.asarray(w))
        back = np.asarray(dequantize(q, s))
        # max error bounded by half a quantization step per channel
        step = np.asarray(s)
        assert (np.abs(back - w) <= step[None, :] * 0.5 + 1e-8).all()

    def test_pallas_kernel_matches_reference(self):
        import jax.numpy as jnp
        from avede_tpu.ops.quant import (quantize_kernel_pallas,
                                         quantize_per_channel)

        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.normal(0, 0.1, (32, 16)).astype(np.float32))
        q1, s1 = quantize_per_channel(w)
        q2, s2 = quantize_kernel_pallas(w, interpret=True)
        np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   rtol=1e-6)

    def test_quantized_matmul_close_to_f32(self):
        import jax.numpy as jnp
        from avede_tpu.ops.quant import (quantize_per_channel,
                                         quantized_matmul)

        rng = np.random.default_rng(2)
        x = rng.normal(size=(8, 64)).astype(np.float32)
        w = rng.normal(0, 0.05, (64, 32)).astype(np.float32)
        q, s = quantize_per_channel(jnp.asarray(w))
        got = np.asarray(quantized_matmul(jnp.asarray(x), q, s))
        ref = x @ w
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 0.02, rel

    def test_tree_quantization_report(self, tiny_clip):
        from avede_tpu.ops.quant import quantize_dense_tree

        _, params = tiny_clip
        q_tree, s_tree, report = quantize_dense_tree(params)
        assert report["kernels_quantized"] > 10
        assert report["ratio"] < 0.5  # better than half the bytes


class TestFlashAttention:
    def test_matches_reference(self):
        import jax.numpy as jnp
        from avede_tpu.ops.attention import (attention_reference,
                                             flash_attention)

        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(2, 4, 64, 16)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(2, 4, 64, 16)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(2, 4, 64, 16)).astype(np.float32))
        got = flash_attention(q, k, v, block_q=32, block_k=32,
                              interpret=True)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_single_block(self):
        import jax.numpy as jnp
        from avede_tpu.ops.attention import (attention_reference,
                                             flash_attention)

        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(1, 2, 16, 8)).astype(np.float32))
        got = flash_attention(q, q, q, block_q=16, block_k=16,
                              interpret=True)
        ref = attention_reference(q, q, q)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_mha_flash_flag_matches_einsum_path(self):
        """MultiHeadAttention(use_flash=True) must equal the einsum
        path for mask-free self-attention at block-divisible L."""
        import jax
        import jax.numpy as jnp
        from avede_tpu.models.layers import MultiHeadAttention

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 64, 32)).astype(np.float32))
        base = MultiHeadAttention(32, 4)
        params = base.init(jax.random.PRNGKey(0), x)["params"]
        ref = base.apply({"params": params}, x)
        flash = MultiHeadAttention(32, 4, use_flash=True)
        got = flash.apply({"params": params}, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=3e-4, atol=3e-4)

    @pytest.mark.parametrize("L", [50, 70, 130])
    def test_arbitrary_length_tail_masked(self, L):
        """ViT token counts (G²+1) are never block-aligned; the wrapper
        pads and the kernel masks padded K columns (verdict item 5)."""
        import jax.numpy as jnp
        from avede_tpu.ops.attention import (attention_reference,
                                             flash_attention)

        rng = np.random.default_rng(L)
        q = jnp.asarray(rng.normal(size=(1, 2, L, 16)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(1, 2, L, 16)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(1, 2, L, 16)).astype(np.float32))
        got = flash_attention(q, k, v, interpret=True)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_clip_tower_flash_parity(self):
        """CLIPConfig(use_flash=True) must reproduce the XLA-attention
        tower embeddings at ViT's natural (odd) token count."""
        import dataclasses

        import jax.numpy as jnp
        from avede_tpu.models.clip import init_clip, tiny_test_config

        cfg = tiny_test_config()          # 4×4 grid + cls = 17 tokens
        model, params = init_clip(cfg, seed=0)
        rng = np.random.default_rng(9)
        px = jnp.asarray(rng.normal(
            size=(3, cfg.image_size, cfg.image_size, 3)).astype(np.float32))
        ref = model.apply({"params": params}, px,
                          method=model.encode_image)

        from avede_tpu.models.clip import CLIPModel

        fmodel = CLIPModel(dataclasses.replace(cfg, use_flash=True))
        got = fmodel.apply({"params": params}, px,
                           method=fmodel.encode_image)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=3e-4, atol=3e-4)
