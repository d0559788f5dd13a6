"""Detection model tests: NMS semantics, YOLOv8 shapes/decode, OWL-ViT
HF parity."""

import numpy as np
import pytest


class TestNMS:
    def test_basic_suppression(self):
        import jax.numpy as jnp
        from avede_tpu.ops.nms import nms_padded

        boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11],
                             [50, 50, 60, 60]], jnp.float32)
        scores = jnp.asarray([0.9, 0.8, 0.7])
        ob, os, valid = nms_padded(boxes, scores, 0.5, max_out=3)
        assert valid.sum() == 2
        np.testing.assert_allclose(np.asarray(os)[:2], [0.9, 0.7])

    def test_overlap_chain_alternates(self):
        """Worst case for the fixpoint formulation: a long chain where
        each box overlaps only its neighbor. Greedy keeps alternating
        boxes; the fixpoint must converge to exactly that."""
        import jax.numpy as jnp
        from avede_tpu.ops.nms import nms_padded

        n = 64
        # box i spans [6i, 6i+10): IoU with neighbor = 4/16 = 0.25 > 0.2
        boxes = np.stack([6.0 * np.arange(n), np.zeros(n),
                          6.0 * np.arange(n) + 10, np.full(n, 10.0)],
                         1).astype(np.float32)
        scores = np.linspace(1.0, 0.5, n).astype(np.float32)
        ob, os, valid = nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                                   0.2, max_out=n)
        kept = np.sort(np.asarray(os)[np.asarray(valid)])[::-1]
        np.testing.assert_allclose(kept, scores[::2], atol=1e-6)

    def test_presorted_equivalent(self):
        """presorted=True on descending-score input must match the
        self-sorting path exactly."""
        import jax.numpy as jnp
        from avede_tpu.ops.nms import nms_padded

        rng = np.random.default_rng(7)
        n = 50
        xy = rng.uniform(0, 80, (n, 2))
        wh = rng.uniform(5, 30, (n, 2))
        boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        scores = np.sort(rng.uniform(0, 1, n).astype(np.float32))[::-1].copy()
        a = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                       max_out=20)
        b = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                       max_out=20, presorted=True)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y))

    def test_matches_torchvision_semantics(self):
        """Cross-check greedy NMS against a numpy oracle on random boxes."""
        import jax.numpy as jnp
        from avede_tpu.ops.nms import nms_padded

        rng = np.random.default_rng(0)
        n = 40
        xy = rng.uniform(0, 80, (n, 2))
        wh = rng.uniform(5, 30, (n, 2))
        boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)

        def iou(a, b):
            lt = np.maximum(a[:2], b[:2])
            rb = np.minimum(a[2:], b[2:])
            i = np.prod(np.clip(rb - lt, 0, None))
            ua = np.prod(a[2:] - a[:2]) + np.prod(b[2:] - b[:2]) - i
            return i / ua

        order = np.argsort(-scores)
        keep = []
        for i in order:
            if all(iou(boxes[i], boxes[j]) <= 0.5 for j in keep):
                keep.append(i)
        expected = sorted(scores[keep], reverse=True)

        ob, os, valid = nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                                   0.5, max_out=n)
        got = sorted(np.asarray(os)[np.asarray(valid)], reverse=True)
        np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_padding_never_surfaces(self):
        import jax.numpy as jnp
        from avede_tpu.ops.nms import nms_padded

        boxes = jnp.zeros((8, 4), jnp.float32)
        scores = jnp.full((8,), -jnp.inf)
        scores = scores.at[0].set(0.5)
        ob, os, valid = nms_padded(boxes, scores, 0.5, max_out=8)
        assert valid.sum() == 1

    def test_per_class_keeps_cross_class_overlaps(self):
        import jax.numpy as jnp
        from avede_tpu.ops.nms import nms_per_class

        boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
        scores = jnp.asarray([0.9, 0.8])
        classes = jnp.asarray([0, 1], jnp.int32)
        ob, os, oc, valid = nms_per_class(boxes, scores, classes, 0.5, 2)
        assert valid.sum() == 2  # different classes → both kept
        assert set(np.asarray(oc)[np.asarray(valid)].tolist()) == {0, 1}
        # original coordinates recovered
        kept = np.asarray(ob)[np.asarray(valid)]
        assert kept.max() <= 11.01


class TestYolo:
    def test_forward_and_decode_shapes(self):
        import jax
        import jax.numpy as jnp
        from avede_tpu.models.yolo import (decode_predictions, init_yolo,
                                           tiny_yolo_config)

        cfg = tiny_yolo_config()
        model, variables = init_yolo(cfg)
        x = jnp.zeros((2, cfg.img_size, cfg.img_size, 3))
        outs = model.apply(variables, x)
        assert len(outs) == 3
        boxes, cls = decode_predictions(outs, cfg)
        a = sum((cfg.img_size // s) ** 2 for s in (8, 16, 32))
        assert boxes.shape == (2, a, 4)
        assert cls.shape == (2, a, cfg.num_classes)
        assert np.asarray(cls).min() >= 0 and np.asarray(cls).max() <= 1

    def test_jit_and_boxes_inside_image(self):
        import jax
        import jax.numpy as jnp
        from avede_tpu.models.yolo import (decode_predictions, init_yolo,
                                           tiny_yolo_config)

        cfg = tiny_yolo_config()
        model, variables = init_yolo(cfg)

        @jax.jit
        def run(v, x):
            return decode_predictions(model.apply(v, x), cfg)

        x = jnp.asarray(np.random.default_rng(0).random(
            (1, cfg.img_size, cfg.img_size, 3)).astype(np.float32))
        boxes, cls = run(variables, x)
        b = np.asarray(boxes)
        # DFL max distance = (reg_max-1)*stride → boxes stay bounded
        assert np.isfinite(b).all()

    def test_channel_scaling(self):
        from avede_tpu.models.yolo import YoloConfig

        n = YoloConfig(scale="n")
        assert n.ch(64) == 16 and n.ch(1024) == 256
        s = YoloConfig(scale="s")
        assert s.ch(1024) == 512


torch = pytest.importorskip("torch")


class TestOwlViTParity:
    @pytest.fixture(scope="class")
    def pair(self):
        from transformers import OwlViTConfig as HFConfig
        from transformers import OwlViTForObjectDetection as HFModel

        from avede_tpu.models.owlvit import (OwlViTDetector,
                                             convert_owlvit_state_dict,
                                             tiny_owlvit_config)

        hf_cfg = HFConfig(
            vision_config=dict(hidden_size=64, intermediate_size=256,
                               num_hidden_layers=2, num_attention_heads=4,
                               image_size=32, patch_size=8),
            text_config=dict(hidden_size=64, intermediate_size=256,
                             num_hidden_layers=2, num_attention_heads=4,
                             vocab_size=100, max_position_embeddings=8),
            projection_dim=64)
        torch.manual_seed(0)
        hf = HFModel(hf_cfg).eval()
        cfg = tiny_owlvit_config()
        params = convert_owlvit_state_dict(hf.state_dict(), 2, 2)
        return hf, OwlViTDetector(cfg), params

    def test_detection_outputs_match(self, pair):
        hf, model, params = pair
        rng = np.random.default_rng(0)
        # HF convention: input_ids is [batch * num_queries, L]; use one
        # image with 3 queries so both sides agree on shapes
        x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
        ids = rng.integers(1, 90, size=(3, 8)).astype(np.int64)
        ids[:, -1] = 99  # max id at end → argmax pooling

        with torch.no_grad():
            out = hf(input_ids=torch.tensor(ids),
                     pixel_values=torch.tensor(x.transpose(0, 3, 1, 2)),
                     attention_mask=torch.ones_like(torch.tensor(ids)))
            ref_logits = out.logits.numpy()
            ref_boxes = out.pred_boxes.numpy()
        logits, boxes = model.apply({"params": params}, x,
                                    ids.astype(np.int32))
        np.testing.assert_allclose(np.asarray(boxes), ref_boxes, atol=3e-4)
        np.testing.assert_allclose(np.asarray(logits), ref_logits,
                                   atol=3e-3)
