"""Torch checkpoint → Flax parameter conversion + param (de)serialization.

The reference loads pretrained torch models from HuggingFace at runtime
(``/root/reference/src/models/openclip_model.py:29-150``). Here weights
are converted offline into our Flax trees. Conversion is validated by
parity tests (tests/test_clip_parity.py): an HF model is built from
config (random init), converted, and outputs must agree to ≤1e-3 cosine.

Torch is only imported inside conversion functions — the serving path
never touches it.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Dict, Mapping

import numpy as np

from ..utils.logging import get_logger

logger = get_logger(__name__)


# ---------------------------------------------------------------------------
# generic helpers
# ---------------------------------------------------------------------------

def _set(tree: Dict[str, Any], path: str, value: np.ndarray) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _np(t: Any) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      dtype=np.float32)


def _convert_encoder_layers(sd: Mapping[str, Any], tree: Dict[str, Any],
                            src_prefix: str, dst_prefix: str,
                            depth: int) -> None:
    """HF CLIP-style encoder layers → our Transformer naming."""
    for i in range(depth):
        s = f"{src_prefix}.layers.{i}"
        d = f"{dst_prefix}/layers_{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _set(tree, f"{d}/self_attn/{proj}/kernel",
                 _np(sd[f"{s}.self_attn.{proj}.weight"]).T)
            _set(tree, f"{d}/self_attn/{proj}/bias",
                 _np(sd[f"{s}.self_attn.{proj}.bias"]))
        for ln in ("layer_norm1", "layer_norm2"):
            _set(tree, f"{d}/{ln}/scale", _np(sd[f"{s}.{ln}.weight"]))
            _set(tree, f"{d}/{ln}/bias", _np(sd[f"{s}.{ln}.bias"]))
        for fc in ("fc1", "fc2"):
            _set(tree, f"{d}/mlp/{fc}/kernel", _np(sd[f"{s}.mlp.{fc}.weight"]).T)
            _set(tree, f"{d}/mlp/{fc}/bias", _np(sd[f"{s}.mlp.{fc}.bias"]))


# ---------------------------------------------------------------------------
# CLIP
# ---------------------------------------------------------------------------

def convert_clip_state_dict(sd: Mapping[str, Any], vision_depth: int = 12,
                            text_depth: int = 12) -> Dict[str, Any]:
    """HF ``CLIPModel`` state_dict → params for ``avede_tpu.models.clip``.

    Handles the HF layout (``vision_model.*``/``text_model.*``); the
    pre-layernorm key accepts both HF's historic ``pre_layrnorm`` spelling
    and the fixed one.
    """
    sd = {k: v for k, v in sd.items()}
    p: Dict[str, Any] = {}

    # vision tower
    _set(p, "vision/patch_embedding/kernel",
         _np(sd["vision_model.embeddings.patch_embedding.weight"]
             ).transpose(2, 3, 1, 0))
    _set(p, "vision/class_embedding",
         _np(sd["vision_model.embeddings.class_embedding"]).reshape(-1))
    _set(p, "vision/position_embedding",
         _np(sd["vision_model.embeddings.position_embedding.weight"]))
    pre_key = ("vision_model.pre_layrnorm.weight"
               if "vision_model.pre_layrnorm.weight" in sd
               else "vision_model.pre_layernorm.weight")
    _set(p, "vision/pre_layernorm/scale", _np(sd[pre_key]))
    _set(p, "vision/pre_layernorm/bias",
         _np(sd[pre_key.replace("weight", "bias")]))
    _convert_encoder_layers(sd, p, "vision_model.encoder", "vision/encoder",
                            vision_depth)
    _set(p, "vision/post_layernorm/scale",
         _np(sd["vision_model.post_layernorm.weight"]))
    _set(p, "vision/post_layernorm/bias",
         _np(sd["vision_model.post_layernorm.bias"]))
    _set(p, "vision/projection/kernel", _np(sd["visual_projection.weight"]).T)

    # text tower
    _set(p, "text/token_embedding/embedding",
         _np(sd["text_model.embeddings.token_embedding.weight"]))
    _set(p, "text/position_embedding",
         _np(sd["text_model.embeddings.position_embedding.weight"]))
    _convert_encoder_layers(sd, p, "text_model.encoder", "text/encoder",
                            text_depth)
    _set(p, "text/final_layer_norm/scale",
         _np(sd["text_model.final_layer_norm.weight"]))
    _set(p, "text/final_layer_norm/bias",
         _np(sd["text_model.final_layer_norm.bias"]))
    _set(p, "text/projection/kernel", _np(sd["text_projection.weight"]).T)

    _set(p, "logit_scale", _np(sd["logit_scale"]).reshape(()))
    return p


# ---------------------------------------------------------------------------
# BLIP
# ---------------------------------------------------------------------------

def convert_blip_state_dict(sd: Mapping[str, Any], vision_depth: int = 12,
                            text_depth: int = 12) -> Dict[str, Any]:
    """HF ``BlipForConditionalGeneration`` state_dict → params for
    ``avede_tpu.models.blip.BlipCaptioner``."""
    p: Dict[str, Any] = {}

    # vision tower
    _set(p, "vision/patch_embedding/kernel",
         _np(sd["vision_model.embeddings.patch_embedding.weight"]
             ).transpose(2, 3, 1, 0))
    _set(p, "vision/patch_embedding/bias",
         _np(sd["vision_model.embeddings.patch_embedding.bias"]))
    _set(p, "vision/class_embedding",
         _np(sd["vision_model.embeddings.class_embedding"]).reshape(-1))
    _set(p, "vision/position_embedding",
         _np(sd["vision_model.embeddings.position_embedding"])[0])
    for i in range(vision_depth):
        s = f"vision_model.encoder.layers.{i}"
        d = f"vision/layers_{i}"
        _set(p, f"{d}/qkv/kernel", _np(sd[f"{s}.self_attn.qkv.weight"]).T)
        _set(p, f"{d}/qkv/bias", _np(sd[f"{s}.self_attn.qkv.bias"]))
        _set(p, f"{d}/projection/kernel",
             _np(sd[f"{s}.self_attn.projection.weight"]).T)
        _set(p, f"{d}/projection/bias",
             _np(sd[f"{s}.self_attn.projection.bias"]))
        for ln in ("layer_norm1", "layer_norm2"):
            _set(p, f"{d}/{ln}/scale", _np(sd[f"{s}.{ln}.weight"]))
            _set(p, f"{d}/{ln}/bias", _np(sd[f"{s}.{ln}.bias"]))
        for fc in ("fc1", "fc2"):
            _set(p, f"{d}/{fc}/kernel", _np(sd[f"{s}.mlp.{fc}.weight"]).T)
            _set(p, f"{d}/{fc}/bias", _np(sd[f"{s}.mlp.{fc}.bias"]))
    _set(p, "vision/post_layernorm/scale",
         _np(sd["vision_model.post_layernorm.weight"]))
    _set(p, "vision/post_layernorm/bias",
         _np(sd["vision_model.post_layernorm.bias"]))

    # text decoder
    tb = "text_decoder.bert"
    _set(p, "text/word_embeddings",
         _np(sd[f"{tb}.embeddings.word_embeddings.weight"]))
    _set(p, "text/position_embeddings",
         _np(sd[f"{tb}.embeddings.position_embeddings.weight"]))
    _set(p, "text/embed_ln/scale",
         _np(sd[f"{tb}.embeddings.LayerNorm.weight"]))
    _set(p, "text/embed_ln/bias", _np(sd[f"{tb}.embeddings.LayerNorm.bias"]))
    for i in range(text_depth):
        s = f"{tb}.encoder.layer.{i}"
        d = f"text/layers_{i}"
        for src, dst in (("attention", "self_attn"),
                         ("crossattention", "cross_attn")):
            for proj in ("query", "key", "value"):
                _set(p, f"{d}/{dst}/{proj}/kernel",
                     _np(sd[f"{s}.{src}.self.{proj}.weight"]).T)
                _set(p, f"{d}/{dst}/{proj}/bias",
                     _np(sd[f"{s}.{src}.self.{proj}.bias"]))
        _set(p, f"{d}/self_output/kernel",
             _np(sd[f"{s}.attention.output.dense.weight"]).T)
        _set(p, f"{d}/self_output/bias",
             _np(sd[f"{s}.attention.output.dense.bias"]))
        _set(p, f"{d}/self_ln/scale",
             _np(sd[f"{s}.attention.output.LayerNorm.weight"]))
        _set(p, f"{d}/self_ln/bias",
             _np(sd[f"{s}.attention.output.LayerNorm.bias"]))
        _set(p, f"{d}/cross_output/kernel",
             _np(sd[f"{s}.crossattention.output.dense.weight"]).T)
        _set(p, f"{d}/cross_output/bias",
             _np(sd[f"{s}.crossattention.output.dense.bias"]))
        _set(p, f"{d}/cross_ln/scale",
             _np(sd[f"{s}.crossattention.output.LayerNorm.weight"]))
        _set(p, f"{d}/cross_ln/bias",
             _np(sd[f"{s}.crossattention.output.LayerNorm.bias"]))
        _set(p, f"{d}/intermediate/kernel",
             _np(sd[f"{s}.intermediate.dense.weight"]).T)
        _set(p, f"{d}/intermediate/bias",
             _np(sd[f"{s}.intermediate.dense.bias"]))
        _set(p, f"{d}/output/kernel", _np(sd[f"{s}.output.dense.weight"]).T)
        _set(p, f"{d}/output/bias", _np(sd[f"{s}.output.dense.bias"]))
        _set(p, f"{d}/output_ln/scale",
             _np(sd[f"{s}.output.LayerNorm.weight"]))
        _set(p, f"{d}/output_ln/bias",
             _np(sd[f"{s}.output.LayerNorm.bias"]))
    cls = "text_decoder.cls.predictions"
    _set(p, "text/transform/kernel", _np(sd[f"{cls}.transform.dense.weight"]).T)
    _set(p, "text/transform/bias", _np(sd[f"{cls}.transform.dense.bias"]))
    _set(p, "text/transform_ln/scale",
         _np(sd[f"{cls}.transform.LayerNorm.weight"]))
    _set(p, "text/transform_ln/bias",
         _np(sd[f"{cls}.transform.LayerNorm.bias"]))
    _set(p, "text/decoder/kernel", _np(sd[f"{cls}.decoder.weight"]).T)
    _set(p, "text/decoder/bias", _np(sd[f"{cls}.decoder.bias"]))
    return p


# ---------------------------------------------------------------------------
# serialization: flat .npz of slash-joined paths (framework-native format)
# ---------------------------------------------------------------------------

def flatten_params(tree: Mapping[str, Any], prefix: str = ""
                   ) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            out.update(flatten_params(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def unflatten_params(flat: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        _set(tree, path, np.asarray(v))
    return tree


def save_params(params: Mapping[str, Any], path: str) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **flatten_params(params))
    logger.info("Saved params → %s", path)


def load_params(path: str) -> Dict[str, Any]:
    with np.load(path) as z:
        return unflatten_params({k: z[k] for k in z.files})


def convert_torch_checkpoint(path: str, kind: str = "clip") -> Dict[str, Any]:
    """Load a torch checkpoint file and convert by model kind."""
    import torch  # local import: conversion-time only

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if kind == "clip":
        depth_v = 1 + max(int(m.group(1)) for k in sd
                          if (m := re.match(r"vision_model\.encoder\.layers\.(\d+)\.", k)))
        depth_t = 1 + max(int(m.group(1)) for k in sd
                          if (m := re.match(r"text_model\.encoder\.layers\.(\d+)\.", k)))
        return convert_clip_state_dict(sd, depth_v, depth_t)
    raise ValueError(f"unknown checkpoint kind: {kind}")
