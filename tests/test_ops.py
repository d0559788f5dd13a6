"""Unit tests for ops: windows, similarity, preprocessing."""

import numpy as np
import pytest

from avede_tpu.ops import windows as W


class TestWindows:
    def test_middle_indices_match_reference_semantics(self):
        # reference: size 16, stride 8, middle = start + 8
        mids = W.window_middle_indices(40, 16, 8)
        np.testing.assert_array_equal(mids, [8, 16, 24, 32])

    def test_short_video_single_window(self):
        mids = W.window_middle_indices(10, 16, 8)
        np.testing.assert_array_equal(mids, [5])

    def test_empty(self):
        assert W.window_middle_indices(0, 16, 8).size == 0
        assert W.window_timestamps([], 16, 8) == []

    def test_timestamps_use_middle_frame(self):
        ts = [float(i) * 0.5 for i in range(40)]
        wts = W.window_timestamps(ts, 16, 8)
        assert wts == [4.0, 8.0, 12.0, 16.0]

    def test_bounds(self):
        b = W.window_bounds(24, 16, 8)
        np.testing.assert_array_equal(b, [[0, 16], [8, 24]])


class TestSimilarity:
    def test_cosine_matches_numpy(self):
        import jax.numpy as jnp
        from avede_tpu.ops.similarity import cosine_scores, l2_normalize

        rng = np.random.default_rng(1)
        f = rng.normal(size=(10, 8)).astype(np.float32)
        q = rng.normal(size=(8,)).astype(np.float32)
        fn = f / np.linalg.norm(f, axis=-1, keepdims=True)
        qn = q / np.linalg.norm(q)
        expected = fn @ qn
        got = cosine_scores(jnp.asarray(f), jnp.asarray(q), normalize=True)
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)

    def test_masked_topk_ignores_padding(self):
        import jax.numpy as jnp
        from avede_tpu.ops.similarity import masked_topk

        scores = jnp.asarray([0.1, 0.9, 0.5, 0.99])
        valid = jnp.asarray([True, True, True, False])
        vals, idx = masked_topk(scores, valid, 2)
        assert list(np.asarray(idx)) == [1, 2]

    def test_window_topk(self):
        import jax.numpy as jnp
        from avede_tpu.ops.similarity import window_topk

        rng = np.random.default_rng(2)
        emb = rng.normal(size=(32, 16)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
        q = rng.normal(size=(16,)).astype(np.float32)
        q /= np.linalg.norm(q)
        mids = np.array([8, 16, 24, -1], dtype=np.int32)
        valid = np.ones(32, dtype=bool)
        vals, idx = window_topk(jnp.asarray(emb), jnp.asarray(valid),
                                jnp.asarray(q), jnp.asarray(mids), k=4)
        ref_scores = emb @ q
        order = np.argsort(ref_scores[[8, 16, 24]])[::-1]
        assert list(np.asarray(idx)[:3]) == list(order)
        assert np.asarray(vals)[3] == -np.inf  # padded window


class TestPreprocess:
    def test_clip_preprocess_shapes_and_range(self, synthetic_frames):
        from avede_tpu.ops.preprocess import clip_preprocess

        out = np.asarray(clip_preprocess(synthetic_frames[:4], size=32))
        assert out.shape == (4, 32, 32, 3)
        # normalized: roughly zero-centered
        assert abs(out.mean()) < 2.0

    def test_clip_preprocess_bf16_close_to_f32(self, synthetic_frames):
        """The bf16 compute path (used when the tower runs bf16) must
        stay within bf16 rounding of the f32 chain — pixel error well
        under one uint8 quantization step in normalized units."""
        from avede_tpu.ops.preprocess import CLIP_STD, clip_preprocess

        f32 = np.asarray(clip_preprocess(synthetic_frames[:4], size=32))
        bf16 = np.asarray(clip_preprocess(
            synthetic_frames[:4], size=32, dtype="bfloat16")
        ).astype(np.float32)
        assert bf16.dtype == np.float32  # cast for comparison
        # one uint8 step is (1/255)/std ≈ 0.015 normalized units;
        # bf16 has ~3 decimal digits → error ≲ 0.03 absolute here
        assert np.abs(bf16 - f32).max() < (1.0 / 255.0) / CLIP_STD.min() * 2

    def test_fold_normalization_equivalence(self):
        import jax
        import jax.numpy as jnp
        from avede_tpu.ops.preprocess import (CLIP_MEAN, CLIP_STD,
                                              fold_normalization)

        rng = np.random.default_rng(3)
        k = jnp.asarray(rng.normal(size=(4, 4, 3, 8)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
        x = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))

        conv = lambda x, k, b: jax.lax.conv_general_dilated(
            x, k, (4, 4), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        xn = (x - CLIP_MEAN) / CLIP_STD
        ref = conv(xn, k, b)
        k2, b2 = fold_normalization(k, b)
        got = conv(x, k2, b2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


class TestMesh:
    def test_virtual_8_device_mesh(self):
        import jax
        from avede_tpu.parallel.mesh import build_mesh

        assert jax.device_count() == 8
        ctx = build_mesh()
        assert ctx.n_devices == 8
        assert ctx.n_data == 8 and ctx.n_model == 1
        assert ctx.pad_to_data(13) == 16

    def test_mesh_2d(self):
        import jax
        from avede_tpu.parallel.mesh import build_mesh

        ctx = build_mesh(jax.devices(), shape=[4, 2])
        assert ctx.n_data == 4 and ctx.n_model == 2

    def test_pick_bucket(self):
        from avede_tpu.parallel.mesh import pick_bucket

        assert pick_bucket(5, [32, 64]) == 32
        assert pick_bucket(33, [32, 64]) == 64
        assert pick_bucket(200, [32, 64]) == 256


class TestCompactTransfer:
    """SCAN_TRANSFER codec: host pack ↔ device unpack round-trip and
    engine-path equivalence (the cold-scan H2D-bandwidth optimization)."""

    def test_i420_pixel_roundtrip(self):
        import cv2

        from avede_tpu.ops.preprocess import (clip_preprocess,
                                              clip_preprocess_i420,
                                              pack_frames_i420)

        rng = np.random.default_rng(0)
        base = rng.integers(0, 255, (18, 32, 3), np.uint8)
        frames = np.stack([
            cv2.resize(np.roll(base, i, 1), (512, 288),
                       interpolation=cv2.INTER_CUBIC)
            for i in range(4)])
        import jax.numpy as jnp

        packed = pack_frames_i420(frames, 224)
        assert packed.shape == (4, 336, 224) and packed.dtype == np.uint8
        px = np.asarray(clip_preprocess_i420(
            jnp.asarray(packed), normalize=False))
        ref = np.asarray(clip_preprocess(
            jnp.asarray(frames), size=224, normalize=False))
        # smooth content: chroma subsampling costs ≈1-2% mean abs
        assert np.abs(px - ref).mean() < 0.03
        assert px.min() >= 0.0 and px.max() <= 1.0

    def test_rgb_pack_geometry(self):
        from avede_tpu.ops.preprocess import pack_frames_rgb

        rng = np.random.default_rng(1)
        frames = rng.integers(0, 255, (3, 288, 512, 3), np.uint8)
        out = pack_frames_rgb(frames, 224)
        assert out.shape == (3, 224, 224, 3)
        # already-at-geometry input passes through untouched
        same = rng.integers(0, 255, (2, 224, 224, 3), np.uint8)
        assert pack_frames_rgb(same, 224) is same

    def test_engine_modes_agree(self, monkeypatch):
        """All three transfer modes produce near-identical embeddings
        through the real engine (tiny config) and distinct cache tags."""
        import cv2

        from avede_tpu.models.clip import init_clip, tiny_test_config
        from avede_tpu.parallel.embed import ClipEngine
        from avede_tpu.utils.config import settings

        cfg = tiny_test_config()
        _, params = init_clip(cfg, seed=0)
        rng = np.random.default_rng(2)
        base = rng.integers(0, 255, (12, 16, 3), np.uint8)
        frames = np.stack([
            cv2.resize(np.roll(base, i, 1), (96, 64),
                       interpolation=cv2.INTER_CUBIC)
            for i in range(6)])

        embs, tags = {}, {}
        for mode in ("full", "rgb", "i420"):
            monkeypatch.setattr(settings, "SCAN_TRANSFER", mode)
            eng = ClipEngine(cfg=cfg, params=params)
            embs[mode] = eng.embed_frames(frames)
            tags[mode] = eng.model_tag
        assert len(set(tags.values())) == 3, tags
        assert "i420" not in tags["full"]
        # per-pixel random chroma is the codec's worst case and the
        # tiny 32 px tower amplifies it; real decoded video measures
        # ≥0.9997 at full geometry (ops/preprocess.py docstring)
        assert (embs["full"] * embs["rgb"]).sum(-1).min() > 0.98
        assert (embs["full"] * embs["i420"]).sum(-1).min() > 0.93

    def test_stream_matches_batch_under_codec(self, monkeypatch):
        """embed_stream and embed_frames must agree exactly under the
        same codec (both pack identically)."""
        from avede_tpu.models.clip import init_clip, tiny_test_config
        from avede_tpu.parallel.embed import ClipEngine
        from avede_tpu.utils.config import settings

        monkeypatch.setattr(settings, "SCAN_TRANSFER", "i420")
        cfg = tiny_test_config()
        _, params = init_clip(cfg, seed=0)
        eng = ClipEngine(cfg=cfg, params=params)
        rng = np.random.default_rng(3)
        frames = rng.integers(0, 255, (10, 64, 96, 3), np.uint8)
        a = eng.embed_frames(frames)
        b = eng.embed_stream(iter([frames[:4], frames[4:]]))
        np.testing.assert_allclose(a, b, atol=1e-5)
