"""Numerical parity: our Flax CLIP vs HuggingFace torch CLIPModel.

The BASELINE bar is ≤1e-3 cosine drift vs the PyTorch reference
(BASELINE.md). No pretrained weights exist in this image, so parity is
validated architecture-level: build an HF model from config (random
init), convert its weights with ``models/convert.py``, and require the
embeddings to agree. This proves the converter + architecture reproduce
reference numerics for ANY checkpoint.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import CLIPConfig as HFConfig
    from transformers import CLIPModel as HFModel

    from avede_tpu.models.clip import CLIPConfig, CLIPModel
    from avede_tpu.models.convert import convert_clip_state_dict

    cfg_kwargs = dict(hidden_size=64, intermediate_size=256,
                      num_hidden_layers=2, num_attention_heads=4)
    hf_cfg = HFConfig(
        text_config=dict(**cfg_kwargs, vocab_size=256,
                         max_position_embeddings=16, hidden_act="quick_gelu",
                         eos_token_id=255),
        vision_config=dict(**cfg_kwargs, image_size=32, patch_size=8,
                           hidden_act="quick_gelu"),
        projection_dim=32,
    )
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()

    ours_cfg = CLIPConfig(image_size=32, patch_size=8, vision_dim=64,
                          vision_depth=2, vision_heads=4, text_dim=64,
                          text_depth=2, text_heads=4, vocab_size=256,
                          max_text_len=16, projection_dim=32)
    params = convert_clip_state_dict(hf.state_dict(), vision_depth=2,
                                     text_depth=2)
    model = CLIPModel(ours_cfg)
    return hf, model, params


def _cos(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1)
                                * np.linalg.norm(b, axis=-1))


class TestCLIPParity:
    def test_image_embeddings_match(self, hf_pair):
        hf, model, params = hf_pair
        rng = np.random.default_rng(0)
        x = rng.random((3, 32, 32, 3)).astype(np.float32)

        with torch.no_grad():
            ref = hf.get_image_features(
                pixel_values=torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
        got = model.apply({"params": params}, x, method=model.encode_image)
        ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
        cos = _cos(np.asarray(got), ref)
        assert np.all(cos > 1 - 1e-3), f"cosine drift: {1 - cos}"
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)

    def test_text_embeddings_match(self, hf_pair):
        hf, model, params = hf_pair
        rng = np.random.default_rng(1)
        ids = rng.integers(1, 250, size=(3, 16))
        ids[:, 0] = 1
        ids[:, -1] = 255  # EOT = max id → argmax pooling position
        ids = ids.astype(np.int64)

        with torch.no_grad():
            ref = hf.get_text_features(input_ids=torch.tensor(ids)).numpy()
        got = model.apply({"params": params}, ids.astype(np.int32),
                          method=model.encode_text)
        ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
        cos = _cos(np.asarray(got), ref)
        assert np.all(cos > 1 - 1e-3), f"cosine drift: {1 - cos}"

    def test_param_roundtrip_serialization(self, hf_pair, tmp_path):
        from avede_tpu.models.convert import (load_params, save_params)

        _, _, params = hf_pair
        p = tmp_path / "clip.npz"
        save_params(params, str(p))
        loaded = load_params(str(p))
        flat_a = np.asarray(params["vision"]["projection"]["kernel"])
        flat_b = np.asarray(loaded["vision"]["projection"]["kernel"])
        np.testing.assert_array_equal(flat_a, flat_b)


class TestTokenizer:
    def test_hash_tokenizer_deterministic(self):
        from avede_tpu.models.tokenizer import Tokenizer

        tok = Tokenizer(bpe_path=None)
        a = tok("a person riding a bike")
        b = tok("a person riding a bike")
        np.testing.assert_array_equal(a, b)
        assert a.shape == (1, 77)
        assert a[0, 0] == tok.sot
        assert tok.eot in a[0]
        # EOT is the max id → argmax pooling lands on it
        assert a[0].argmax() == list(a[0]).index(tok.eot)

    def test_batch_shape(self):
        from avede_tpu.models.tokenizer import Tokenizer

        tok = Tokenizer(bpe_path=None)
        out = tok(["one", "two words here"])
        assert out.shape == (2, 77)
        assert (out[:, 0] == tok.sot).all()
