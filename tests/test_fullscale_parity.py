"""Full-geometry ViT-B/32 parity + preprocessing-chain parity.

Round-1 verdict items 2a/2b: the tiny-config parity suites prove the
converter, not the model — pooling/position-embedding/bucket bugs live
at real geometry. Here:

- ``TestViTB32Parity``: random-init HF ``CLIPModel`` at its default
  (ViT-B/32) geometry → convert → require ≤1e-3 cosine drift on both
  towers. This is the BASELINE bar at the scale real checkpoints have.
- ``TestPreprocessParity``: our device-side preprocess
  (central-square-crop → bicubic resize → normalize,
  ``ops/preprocess.py``) vs the reference's host chain
  (PIL bicubic shortest-side resize → center crop → normalize — the
  torchvision transform behind ``openclip_model.py:171``), with
  quantified pixel drift AND embedding-level cosine through the
  full-geometry tower.

CPU-heavy (12-layer towers) — a few forwards only.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _cos(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1)
                                * np.linalg.norm(b, axis=-1))


@pytest.fixture(scope="module")
def b32_pair():
    from transformers import CLIPConfig as HFConfig
    from transformers import CLIPModel as HFModel

    from avede_tpu.models.clip import CLIPModel, vit_b32
    from avede_tpu.models.convert import convert_clip_state_dict

    torch.manual_seed(0)
    hf = HFModel(HFConfig()).eval()  # HF defaults ARE ViT-B/32 geometry
    cfg = vit_b32()
    assert hf.config.vision_config.hidden_size == cfg.vision_dim
    assert hf.config.vision_config.patch_size == cfg.patch_size
    assert hf.config.text_config.hidden_size == cfg.text_dim
    params = convert_clip_state_dict(hf.state_dict(), vision_depth=12,
                                     text_depth=12)
    return hf, CLIPModel(cfg), params, cfg


class TestViTB32Parity:
    def test_image_tower_full_geometry(self, b32_pair):
        hf, model, params, cfg = b32_pair
        rng = np.random.default_rng(0)
        x = rng.random((2, 224, 224, 3)).astype(np.float32)

        with torch.no_grad():
            ref = hf.get_image_features(
                pixel_values=torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
        ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
        got = np.asarray(model.apply({"params": params}, x,
                                     method=model.encode_image))
        cos = _cos(got, ref)
        assert np.all(cos > 1 - 1e-3), f"cosine drift {1 - cos}"
        np.testing.assert_allclose(got, ref, atol=5e-4)

    def test_text_tower_full_geometry(self, b32_pair):
        hf, model, params, cfg = b32_pair
        rng = np.random.default_rng(1)
        ids = np.zeros((2, 77), np.int64)
        for r in range(2):
            n = 10 + 20 * r
            ids[r, 0] = 49406              # SOT
            ids[r, 1:1 + n] = rng.integers(1, 49000, n)
            ids[r, 1 + n] = 49407          # EOT (max id → argmax pool)

        with torch.no_grad():
            ref = hf.get_text_features(input_ids=torch.tensor(ids)).numpy()
        ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
        got = np.asarray(model.apply({"params": params},
                                     ids.astype(np.int32),
                                     method=model.encode_text))
        cos = _cos(got, ref)
        assert np.all(cos > 1 - 1e-3), f"cosine drift {1 - cos}"


def _smooth_frames(shapes, seed=0):
    """Synthetic 'natural' frames: smooth low-frequency content, so the
    resize comparison is representative of video, not of noise."""
    import cv2

    rng = np.random.default_rng(seed)
    out = []
    for h, w in shapes:
        small = rng.random((h // 16, w // 16, 3)).astype(np.float32)
        img = cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
        img = np.clip(img, 0, 1)
        out.append((img * 255).astype(np.uint8))
    return out


def _reference_preprocess(frame_u8: np.ndarray, size: int = 224
                          ) -> np.ndarray:
    """The reference's host chain (torchvision transform semantics,
    ``openclip_model.py:171``): PIL bicubic resize shortest side → size,
    center crop size×size, scale to [0,1], CLIP-normalize. → [S,S,3]."""
    from PIL import Image

    from avede_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD

    img = Image.fromarray(frame_u8)
    w, h = img.size
    if h < w:
        nh, nw = size, int(round(w * size / h))
    else:
        nh, nw = int(round(h * size / w)), size
    img = img.resize((nw, nh), Image.BICUBIC)
    left = (nw - size) // 2
    top = (nh - size) // 2
    img = img.crop((left, top, left + size, top + size))
    x = np.asarray(img, np.float32) / 255.0
    return (x - CLIP_MEAN) / CLIP_STD


class TestPreprocessParity:
    # Measured drift vs the PIL chain (normalized units; 1.0 ≈ 69 raw
    # gray levels). 288×512: the two chains' crops align exactly →
    # resampling-only drift. 480×640: round(640·224/480)=299 gives the
    # reference a half-pixel crop offset vs our exact center crop — a
    # global sub-pixel shift dominates pixel-wise drift while the
    # embedding stays within 1e-3 cosine (test below).
    @pytest.mark.parametrize("shape,mean_bound,p99_bound",
                             [((288, 512), 0.02, 0.12),
                              ((480, 640), 0.12, 0.45)])
    def test_pixel_drift_quantified(self, shape, mean_bound, p99_bound):
        """Ours (crop→resize on device) vs reference (resize→crop on
        host): same content, drift bounded and documented."""
        from avede_tpu.ops.preprocess import clip_preprocess

        (frame,) = _smooth_frames([shape])
        ref = _reference_preprocess(frame)
        got = np.asarray(clip_preprocess(frame[None]))[0]
        drift = np.abs(got - ref)
        assert drift.mean() < mean_bound, f"mean drift {drift.mean():.4f}"
        assert np.quantile(drift, 0.99) < p99_bound, (
            f"p99 drift {np.quantile(drift, 0.99):.4f}")

    def test_embedding_cosine_full_geometry(self, b32_pair):
        """The BASELINE bar measured where it matters: both preprocess
        chains through the SAME full-geometry tower must agree to 1e-3
        cosine (isolates preprocessing as the only difference)."""
        from avede_tpu.ops.preprocess import clip_preprocess

        _, model, params, _ = b32_pair
        frames = _smooth_frames([(288, 512), (288, 512), (480, 640)],
                                seed=3)

        def embed(px):
            return np.asarray(model.apply({"params": params},
                                          px.astype(np.float32),
                                          method=model.encode_image))

        for frame in frames:
            ref_px = _reference_preprocess(frame)[None]
            got_px = np.asarray(clip_preprocess(frame[None]))
            cos = _cos(embed(got_px), embed(ref_px))
            assert np.all(cos > 1 - 1e-3), f"embedding drift {1 - cos}"


class TestOtherTowersFullGeometry:
    """Full-geometry random-init parity for the remaining towers (the
    tiny-config suites prove the converters; real checkpoints live at
    these geometries — verdict weak #5 generalized past CLIP)."""

    def test_owlvit_base_768(self):
        from transformers import OwlViTConfig as HFConfig
        from transformers import OwlViTForObjectDetection as HFModel

        from avede_tpu.models.owlvit import (OwlViTDetector,
                                             convert_owlvit_state_dict,
                                             owlvit_base_patch32)

        torch.manual_seed(0)
        hf = HFModel(HFConfig()).eval()     # defaults = base-patch32/768
        cfg = owlvit_base_patch32()
        assert hf.config.vision_config.image_size == cfg.image_size
        params = convert_owlvit_state_dict(hf.state_dict(), 12, 12)
        model = OwlViTDetector(cfg)

        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 768, 768, 3)).astype(np.float32) * 0.5
        ids = rng.integers(1, 49000, size=(2, 16)).astype(np.int64)
        ids[:, -1] = 49407
        with torch.no_grad():
            out = hf(input_ids=torch.tensor(ids),
                     pixel_values=torch.tensor(x.transpose(0, 3, 1, 2)),
                     attention_mask=torch.ones_like(torch.tensor(ids)))
        logits, boxes = model.apply({"params": params}, x,
                                    ids.astype(np.int32))
        np.testing.assert_allclose(np.asarray(boxes),
                                   out.pred_boxes.numpy(), atol=1e-3)
        np.testing.assert_allclose(np.asarray(logits),
                                   out.logits.numpy(), atol=2e-2)

    def test_blip2_qformer_full_geometry(self):
        """Q-Former at FULL default geometry (768 dim, 12 layers,
        12 heads, 32 query tokens, 1408-dim cross-attention KV) vs HF
        Blip2ForImageTextRetrieval. Vision depth is cut to 2 layers to
        keep the random model constructible on CPU — each vision layer
        still runs at the real 1408-dim/16-head geometry, so the
        fused-qkv head split is exercised at scale too."""
        from transformers import Blip2Config as HFConfig
        from transformers import Blip2ForImageTextRetrieval as HFModel

        from avede_tpu.models.qformer import (Blip2Retrieval,
                                              QFormerConfig,
                                              convert_blip2_state_dict)

        cfg = QFormerConfig(vision_depth=2)
        hf_cfg = HFConfig(
            vision_config=dict(hidden_size=cfg.vision_dim,
                               intermediate_size=cfg.vision_mlp,
                               num_hidden_layers=cfg.vision_depth,
                               num_attention_heads=cfg.vision_heads,
                               image_size=cfg.image_size,
                               patch_size=cfg.patch_size),
            qformer_config=dict(vocab_size=cfg.vocab_size,
                                use_qformer_text_input=True),
            text_config=dict(vocab_size=cfg.vocab_size),
            num_query_tokens=cfg.num_query_tokens,
            image_text_hidden_size=cfg.projection_dim)
        # our defaults must BE the HF defaults (the BLIP text tower's
        # 12-vs-8 head bug motivated this assertion style)
        q = hf_cfg.qformer_config
        assert (q.hidden_size, q.num_hidden_layers, q.num_attention_heads,
                q.intermediate_size, q.cross_attention_frequency,
                q.encoder_hidden_size) == (cfg.hidden, cfg.depth, cfg.heads,
                                           cfg.mlp, cfg.cross_frequency,
                                           cfg.vision_dim)
        torch.manual_seed(0)
        hf = HFModel(hf_cfg).eval()
        params = convert_blip2_state_dict(hf.state_dict(), cfg)
        model = Blip2Retrieval(cfg)

        rng = np.random.default_rng(2)
        x = rng.normal(size=(1, 224, 224, 3)).astype(np.float32) * 0.5
        ids = rng.integers(1, 30000, size=(2, 8)).astype(np.int64)
        with torch.no_grad():
            ref = hf(pixel_values=torch.tensor(x.transpose(0, 3, 1, 2)),
                     input_ids=torch.tensor(ids),
                     attention_mask=torch.ones_like(torch.tensor(ids)),
                     use_image_text_matching_head=False
                     ).logits_per_image.numpy()
        got = np.asarray(model.apply({"params": params}, x,
                                     ids.astype(np.int32),
                                     np.ones_like(ids, bool)))
        np.testing.assert_allclose(got, ref, atol=1e-3)

    def test_efficientnet_b0_224(self):
        """Full B0 geometry vs HF EfficientNetModel — exercises the
        TF-SAME asymmetric stride-2 padding, channel/depth rounding and
        the converter over all 16 MBConv blocks, so the public
        google/efficientnet-b0 checkpoint converts directly."""
        from transformers import EfficientNetConfig as HFConfig
        from transformers import EfficientNetModel as HFModel

        from avede_tpu.models.effnet import (EfficientNet,
                                             convert_effnet_state_dict,
                                             effnet_b0)

        torch.manual_seed(0)
        hf = HFModel(HFConfig(width_coefficient=1.0, depth_coefficient=1.0,
                              hidden_dim=1280, image_size=224,
                              # keep train-mode BN calibration identical
                              # to the eval forward (no stochastic depth)
                              drop_connect_rate=0.0))
        cfg = effnet_b0()

        rng = np.random.default_rng(3)
        x = rng.normal(size=(2, 224, 224, 3)).astype(np.float32) * 0.5
        # HF random-init uses std=0.02 for every conv, which drives
        # activation variance below BN eps (1e-3) — activations vanish
        # multiplicatively over 16 blocks. Re-init convs at kaiming scale
        # (what a real checkpoint looks like), then calibrate BN running
        # stats on the test batch itself: momentum=None → running stats
        # == batch stats exactly after one train-mode pass.
        for m in hf.modules():
            if isinstance(m, torch.nn.Conv2d):
                torch.nn.init.kaiming_normal_(m.weight)
            if isinstance(m, torch.nn.BatchNorm2d):
                m.momentum = None
                m.reset_running_stats()
        hf.train()
        with torch.no_grad():
            hf(pixel_values=torch.tensor(x.transpose(0, 3, 1, 2)))
        hf = hf.eval()
        # random-init features come out ~1e-10 (SE gating halves every
        # block and BN eps floors the rescale once var < eps — identical
        # on both sides, but it puts our L2-norm 1e-9 guard in play);
        # scale the final gamma so features are O(1) like a real
        # checkpoint's
        with torch.no_grad():
            hf.encoder.top_bn.weight.mul_(1e8)
        variables = convert_effnet_state_dict(hf.state_dict(), cfg)
        model = EfficientNet(cfg)

        with torch.no_grad():
            ref = hf(pixel_values=torch.tensor(x.transpose(0, 3, 1, 2))
                     ).pooler_output.numpy()
        ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
        got = np.asarray(model.apply(variables, x))
        np.testing.assert_allclose(got, ref, atol=1e-3)

    def test_blip_base_384(self):
        from transformers import BlipConfig as HFConfig
        from transformers import \
            BlipForConditionalGeneration as HFModel

        from avede_tpu.models.blip import BlipCaptioner, blip_base
        from avede_tpu.models.convert import convert_blip_state_dict

        torch.manual_seed(0)
        hf = HFModel(HFConfig()).eval()     # defaults = captioning-base
        cfg = blip_base()
        assert hf.config.vision_config.image_size == cfg.image_size
        params = convert_blip_state_dict(hf.state_dict(), 12, 12)
        model = BlipCaptioner(cfg)

        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 384, 384, 3)).astype(np.float32) * 0.5
        ids = rng.integers(1, 30000, size=(1, 8)).astype(np.int64)
        ids[:, 0] = cfg.bos_token_id
        with torch.no_grad():
            ref = hf(pixel_values=torch.tensor(x.transpose(0, 3, 1, 2)),
                     input_ids=torch.tensor(ids)).logits.numpy()
        got = np.asarray(model.apply({"params": params}, x,
                                     ids.astype(np.int32)))
        # compare next-token DISTRIBUTIONS where it matters: cosine of
        # logit rows ≥ 1-1e-3 and argmax agreement
        cos = _cos(got.reshape(-1, got.shape[-1]),
                   ref.reshape(-1, ref.shape[-1]))
        assert np.all(cos > 1 - 1e-3), f"logit row drift {1 - cos}"
        assert (got.argmax(-1) == ref.argmax(-1)).all()
