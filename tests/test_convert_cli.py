"""tools/convert_weights.py: HF snapshot dir → .npz round trip."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/tools")


def _run_cli(model, src, out):
    import convert_weights

    assert convert_weights.main(
        ["--model", model, "--src", str(src), "--out", str(out)]) == 0


class TestConvertCLI:
    def test_clip_snapshot_dir(self, tmp_path):
        from transformers import CLIPConfig as HFConfig
        from transformers import CLIPModel as HFModel

        from avede_tpu.models.clip import CLIPConfig, CLIPModel
        from avede_tpu.models.convert import load_params

        cfg_kwargs = dict(hidden_size=64, intermediate_size=256,
                          num_hidden_layers=2, num_attention_heads=4)
        hf_cfg = HFConfig(
            text_config=dict(**cfg_kwargs, vocab_size=256,
                             max_position_embeddings=16,
                             hidden_act="quick_gelu", eos_token_id=255),
            vision_config=dict(**cfg_kwargs, image_size=32, patch_size=8,
                               hidden_act="quick_gelu"),
            projection_dim=32)
        torch.manual_seed(0)
        hf = HFModel(hf_cfg).eval()
        src = tmp_path / "clip_snapshot"
        hf.save_pretrained(src, safe_serialization=False)
        out = tmp_path / "clip.npz"
        _run_cli("clip", src, out)

        params = load_params(str(out))
        cfg = CLIPConfig(image_size=32, patch_size=8, vision_dim=64,
                         vision_depth=2, vision_heads=4, text_dim=64,
                         text_depth=2, text_heads=4, vocab_size=256,
                         max_text_len=16, projection_dim=32)
        model = CLIPModel(cfg)
        x = np.random.default_rng(0).normal(
            size=(1, 32, 32, 3)).astype(np.float32)
        emb = np.asarray(model.apply({"params": params}, x,
                                     method=model.encode_image))
        ref = hf.get_image_features(
            torch.tensor(x.transpose(0, 3, 1, 2))).detach().numpy()
        cos = (emb * ref).sum(-1) / (
            np.linalg.norm(emb, axis=-1) * np.linalg.norm(ref, axis=-1))
        assert np.all(cos > 1 - 1e-4), cos

    def test_efficientnet_state_dict_file(self, tmp_path):
        from transformers import EfficientNetConfig, EfficientNetModel

        from avede_tpu.models.convert import load_params
        from avede_tpu.models.effnet import tiny_effnet_config

        torch.manual_seed(0)
        hf = EfficientNetModel(EfficientNetConfig(
            width_coefficient=0.25, depth_coefficient=0.34,
            hidden_dim=64, image_size=64))
        src = tmp_path / "effnet.pt"
        torch.save(hf.state_dict(), src)
        out = tmp_path / "effnet.npz"
        import convert_weights

        # the default cfg is B0; tiny geometry needs the library call,
        # so drive load_state_dict + convert manually through the CLI's
        # helpers for the file path case
        sd = convert_weights.load_state_dict(str(src), "efficientnet")
        from avede_tpu.models.convert import save_params
        from avede_tpu.models.effnet import convert_effnet_state_dict

        save_params(convert_effnet_state_dict(sd, tiny_effnet_config()),
                    str(out))
        variables = load_params(str(out))
        assert "params" in variables and "batch_stats" in variables

    def test_unknown_model_rejected(self):
        import convert_weights

        with pytest.raises(SystemExit):
            convert_weights.main(["--model", "nope", "--src", "x",
                                  "--out", "y"])
