"""Native hostops tests — native vs numpy-fallback agreement."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def lib_available():
    from avede_tpu.native import hostops

    return hostops.available()


class TestHostops:
    def test_builds_and_loads(self, lib_available):
        assert lib_available, "g++ is in this image; hostops must build"

    def test_phash_matches_python(self):
        from avede_tpu.native import hostops
        from avede_tpu.ops.image_feats import perceptual_hash

        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 255, (5, 64, 96), dtype=np.uint8)
        native = hostops.phash_batch(imgs)
        for i in range(5):
            bits = perceptual_hash(imgs[i])
            weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
            expected = (bits.astype(np.uint64) * weights).sum(
                dtype=np.uint64)
            # hashes may differ slightly at cell boundaries (area
            # average vs cv2 INTER_AREA) — compare by hamming closeness
            d = bin(int(native[i]) ^ int(expected)).count("1")
            assert d <= 6, f"hash {i} differs by {d} bits"

    def test_hamming(self):
        from avede_tpu.native import hostops

        hashes = np.array([0, 0xFF, 0xFFFF], np.uint64)
        d = hostops.hamming_batch(0xFF, hashes)
        assert list(d) == [8, 0, 8]

    def test_iou_matches_numpy(self):
        from avede_tpu.native import hostops

        rng = np.random.default_rng(1)
        xy = rng.uniform(0, 50, (10, 2)).astype(np.float32)
        wh = rng.uniform(5, 20, (10, 2)).astype(np.float32)
        a = np.concatenate([xy, xy + wh], 1)
        native = hostops.pairwise_iou(a, a)
        import jax.numpy as jnp
        from avede_tpu.ops.boxes import pairwise_iou as jiou

        ref = np.asarray(jiou(jnp.asarray(a), jnp.asarray(a)))
        np.testing.assert_allclose(native, ref, atol=1e-5)

    def test_nms_matches_device_version(self):
        from avede_tpu.native import hostops

        rng = np.random.default_rng(2)
        xy = rng.uniform(0, 80, (30, 2)).astype(np.float32)
        wh = rng.uniform(5, 30, (30, 2)).astype(np.float32)
        boxes = np.concatenate([xy, xy + wh], 1)
        scores = rng.uniform(0, 1, 30).astype(np.float32)
        keep = hostops.nms(boxes, scores, 0.5)

        import jax.numpy as jnp
        from avede_tpu.ops.nms import nms_padded

        _, os_, valid = nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                                   0.5, max_out=30)
        device_scores = sorted(np.asarray(os_)[np.asarray(valid)],
                               reverse=True)
        native_scores = sorted(scores[keep], reverse=True)
        np.testing.assert_allclose(native_scores, device_scores, atol=1e-6)

    def test_temporal_dedup(self):
        from avede_tpu.native import hostops

        boxes = np.array([[0, 0, 10, 10]] * 3, np.float32)
        times = np.array([1.0, 2.0, 9.0], np.float32)
        qids = np.array([0, 0, 0], np.int32)
        keep = hostops.temporal_dedup(boxes, times, qids, 2.0, 0.5)
        assert list(keep) == [0, 2]
