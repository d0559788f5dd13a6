"""EfficientNet, U-Net segmenter, prefetch pipeline tests."""

import numpy as np
import pytest


class TestEfficientNet:
    def test_forward_shapes_and_norm(self):
        import jax
        import jax.numpy as jnp

        from avede_tpu.models.effnet import init_effnet, tiny_effnet_config

        cfg = tiny_effnet_config()
        model, variables = init_effnet(cfg, image_size=64)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 64, 64, 3)).astype(np.float32))
        feats = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
        assert feats.shape == (2, cfg.feature_dim)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(feats), axis=-1),
                                   1.0, atol=1e-3)

    def test_b0_channel_table(self):
        from avede_tpu.models.effnet import effnet_b0

        cfg = effnet_b0()
        assert cfg.ch(32) == 32 and cfg.ch(16) == 16
        assert cfg.feature_dim == 1280  # reference 1280-d contract

    def test_stride_reduction(self):
        """B0 downsamples 32× total (stem 2 + four stride-2 stages)."""
        import jax.numpy as jnp

        from avede_tpu.models.effnet import (EfficientNet,
                                             tiny_effnet_config)

        cfg = tiny_effnet_config()
        model = EfficientNet(cfg)
        import jax

        v = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 64, 64, 3)))
        # just ensure init works at a non-default size (static pooling)
        assert "params" in v


class TestSegmenter:
    def test_forward_and_prior(self):
        import jax
        import jax.numpy as jnp

        from avede_tpu.models.segmenter import (init_segmenter,
                                                render_box_prior,
                                                tiny_segmenter_config)

        cfg = tiny_segmenter_config()
        model, params = init_segmenter(cfg)
        px = jnp.asarray(np.random.default_rng(0).random(
            (2, 32, 32, 3)).astype(np.float32))
        prior = np.stack([
            render_box_prior((100, 100), [20, 20, 60, 60], 32),
            render_box_prior((100, 100), [0, 0, 50, 50], 32)])
        logits = jax.jit(lambda p, x, b: model.apply(
            {"params": p}, x, b))(params, px, jnp.asarray(prior))
        assert logits.shape == (2, 32, 32)

    def test_training_learns_box_mask(self):
        """The U-Net learns 'mask = box prior' in a few steps — a sanity
        check that gradients flow through the whole decoder."""
        import jax
        import jax.numpy as jnp
        import optax

        from avede_tpu.models.segmenter import (init_segmenter,
                                                segmentation_loss,
                                                tiny_segmenter_config)

        cfg = tiny_segmenter_config()
        model, params = init_segmenter(cfg)
        tx = optax.adam(3e-3)
        opt_state = tx.init(params)
        rng = np.random.default_rng(0)
        px = jnp.asarray(rng.random((4, 32, 32, 3)).astype(np.float32))
        prior = np.zeros((4, 32, 32), np.float32)
        prior[:, 8:24, 8:24] = 1.0
        prior = jnp.asarray(prior)
        masks = prior  # target = the box itself

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                return segmentation_loss(
                    model.apply({"params": p}, px, prior), masks)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        losses = []
        for _ in range(25):
            params, opt_state, loss = step(params, opt_state)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.5, losses[:3] + losses[-3:]


class TestPrefetch:
    def test_prefetch_yields_device_arrays_in_order(self):
        import jax

        from avede_tpu.parallel.prefetch import prefetch_to_device

        batches = [np.full((4, 8), i, np.float32) for i in range(5)]
        out = list(prefetch_to_device(iter(batches), buffer_size=2))
        assert len(out) == 5
        for i, o in enumerate(out):
            assert isinstance(o, jax.Array)
            assert float(np.asarray(o)[0, 0]) == i

    def test_transform_runs_on_worker(self):
        from avede_tpu.parallel.prefetch import prefetch_to_device

        out = list(prefetch_to_device(iter([1, 2, 3]),
                                      transform=lambda x: np.full((2,), x)))
        assert [int(np.asarray(o)[0]) for o in out] == [1, 2, 3]

    def test_worker_error_propagates(self):
        from avede_tpu.parallel.prefetch import prefetch_to_device

        def bad():
            yield np.zeros(2)
            raise RuntimeError("decode failed")

        it = prefetch_to_device(bad())
        next(it)
        with pytest.raises(RuntimeError, match="decode failed"):
            list(it)

    def test_frame_batcher(self, test_video):
        from avede_tpu.io.video_reader import VideoReader
        from avede_tpu.parallel.prefetch import FrameBatcher

        fb = FrameBatcher(VideoReader(), test_video, batch=32)
        batches = list(fb)
        assert len(fb) == 3
        assert sum(len(b) for b in batches) == 75
