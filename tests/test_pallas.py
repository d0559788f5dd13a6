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
