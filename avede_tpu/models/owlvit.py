"""OWL-ViT open-vocabulary detector in Flax.

Re-implements the model behind the reference's ``UniversalDetector``
OWL-ViT path (``/root/reference/src/services/universal_detector.py:331-381,
450-545``; HF ``google/owlvit-base-patch32``). Numerics match HF
``OwlViTForObjectDetection`` (validated in tests/test_owlvit_parity.py):

- CLIP-style vision tower, post-layernorm over ALL tokens;
- patch features merged with the class token (elementwise product +
  LayerNorm);
- class head: image→query-space projection, unit-norm dot with text
  query embeddings, learnable shift & (elu+1) scale;
- box head: 3-layer gelu MLP + grid bias → sigmoid cxcywh in [0, 1].

TPU-first: ONE jitted forward scores all queries against all patches
for a whole frame batch; outputs are fixed-shape ``[B, P, Q]`` logits +
``[B, P, 4]`` boxes feeding the padded NMS. The reference runs one
frame at a time under a thread lock.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


from .layers import Transformer


@dataclasses.dataclass(frozen=True)
class OwlViTConfig:
    image_size: int = 768
    patch_size: int = 32
    vision_dim: int = 768
    vision_depth: int = 12
    vision_heads: int = 12
    text_dim: int = 512
    text_depth: int = 12
    text_heads: int = 8
    vocab_size: int = 49408
    max_text_len: int = 16
    projection_dim: int = 512
    ln_eps: float = 1e-5
    dtype: str = "float32"
    use_flash: bool = False   # Pallas flash attention (577-token ViT)

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def jnp_dtype(self) -> jnp.dtype:
        return jnp.dtype(self.dtype)


def owlvit_base_patch32() -> OwlViTConfig:
    return OwlViTConfig()


def tiny_owlvit_config() -> OwlViTConfig:
    return OwlViTConfig(image_size=32, patch_size=8, vision_dim=64,
                        vision_depth=2, vision_heads=4, text_dim=64,
                        text_depth=2, text_heads=4, vocab_size=100,
                        max_text_len=8, projection_dim=64)


class OwlVisionEncoder(nn.Module):
    """→ token hidden states [N, P+1, D] after post-layernorm."""

    cfg: OwlViTConfig

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        cfg = self.cfg
        dt = cfg.jnp_dtype
        x = nn.Conv(cfg.vision_dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
                    dtype=dt, name="patch_embedding")(pixels.astype(dt))
        n = x.shape[0]
        x = x.reshape(n, cfg.num_patches, cfg.vision_dim)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.vision_dim,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(dt), (n, 1, cfg.vision_dim)), x],
            axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (cfg.num_patches + 1, cfg.vision_dim))
        x = x + pos.astype(dt)
        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=dt,
                         name="pre_layernorm")(x)
        x = Transformer(cfg.vision_dim, cfg.vision_depth, cfg.vision_heads,
                        use_flash=cfg.use_flash,
                        mlp_ratio=4.0, activation="quick_gelu",
                        ln_eps=cfg.ln_eps, dtype=dt, name="encoder")(x)
        return nn.LayerNorm(epsilon=cfg.ln_eps, dtype=dt,
                            name="post_layernorm")(x)


class OwlTextEncoder(nn.Module):
    """ids [Q, L] → query embeddings [Q, projection_dim] (not normalized;
    HF normalizes inside the class head)."""

    cfg: OwlViTConfig

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        cfg = self.cfg
        dt = cfg.jnp_dtype
        tok = nn.Embed(cfg.vocab_size, cfg.text_dim, dtype=dt,
                       name="token_embedding")(ids)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (cfg.max_text_len, cfg.text_dim))
        x = tok + pos[None, : ids.shape[1], :].astype(dt)
        x = Transformer(cfg.text_dim, cfg.text_depth, cfg.text_heads,
                        mlp_ratio=4.0, activation="quick_gelu",
                        ln_eps=cfg.ln_eps, dtype=dt, name="encoder")(
            x, causal=True)
        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=dt,
                         name="final_layer_norm")(x)
        eot = jnp.argmax(ids, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0, :]
        return nn.Dense(cfg.projection_dim, use_bias=False, dtype=dt,
                        name="text_projection")(pooled)


class OwlViTDetector(nn.Module):
    cfg: OwlViTConfig

    def setup(self) -> None:
        cfg = self.cfg
        dt = cfg.jnp_dtype
        self.vision = OwlVisionEncoder(cfg)
        self.text = OwlTextEncoder(cfg)
        self.merge_ln = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=dt)
        # HF quirk: the class head projects image features to the TEXT
        # hidden size (== projection_dim in every released checkpoint)
        self.cls_dense0 = nn.Dense(cfg.text_dim, dtype=dt)
        self.logit_shift = nn.Dense(1, dtype=dt)
        self.logit_scale = nn.Dense(1, dtype=dt)
        self.box_dense0 = nn.Dense(cfg.vision_dim, dtype=dt)
        self.box_dense1 = nn.Dense(cfg.vision_dim, dtype=dt)
        self.box_dense2 = nn.Dense(4, dtype=dt)

    def image_features(self, pixels: jax.Array) -> jax.Array:
        """→ merged patch features [N, P, D]."""
        tokens = self.vision(pixels)
        cls_tok = tokens[:, :1, :]
        feats = tokens[:, 1:, :] * cls_tok
        return self.merge_ln(feats)

    def box_bias(self) -> jax.Array:
        g = self.cfg.grid
        coords = (jnp.stack(jnp.meshgrid(jnp.arange(1, g + 1),
                                         jnp.arange(1, g + 1),
                                         indexing="xy"), -1)
                  .astype(jnp.float32) / g)
        coords = jnp.clip(coords.reshape(-1, 2), 0.0, 1.0)
        coord_bias = jnp.log(coords + 1e-4) - jnp.log1p(-coords + 1e-4)
        size = jnp.full_like(coord_bias, 1.0 / g)
        size_bias = jnp.log(size + 1e-4) - jnp.log1p(-size + 1e-4)
        return jnp.concatenate([coord_bias, size_bias], axis=-1)

    def __call__(self, pixels: jax.Array, query_ids: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
        """→ (logits [N, P, Q], boxes [N, P, 4] cxcywh in [0, 1])."""
        feats = self.image_features(pixels)
        queries = self.text(query_ids)

        img_cls = self.cls_dense0(feats)
        img_n = img_cls / (jnp.linalg.norm(img_cls, axis=-1,
                                           keepdims=True) + 1e-6)
        q_n = queries / (jnp.linalg.norm(queries, axis=-1,
                                         keepdims=True) + 1e-6)
        logits = jnp.einsum("npd,qd->npq", img_n, q_n,
                            preferred_element_type=jnp.float32)
        shift = self.logit_shift(feats)
        scale = nn.elu(self.logit_scale(feats)) + 1.0
        logits = (logits + shift) * scale

        b = self.box_dense0(feats)
        b = nn.gelu(b, approximate=False)
        b = self.box_dense1(b)
        b = nn.gelu(b, approximate=False)
        b = self.box_dense2(b)
        boxes = jax.nn.sigmoid(b + self.box_bias()[None])
        return logits.astype(jnp.float32), boxes.astype(jnp.float32)


def init_owlvit(cfg: Optional[OwlViTConfig] = None, seed: int = 0):
    cfg = cfg or owlvit_base_patch32()
    model = OwlViTDetector(cfg)
    rng = jax.random.PRNGKey(seed)
    px = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    ids = jnp.zeros((1, cfg.max_text_len), jnp.int32)
    params = model.init(rng, px, ids)["params"]
    return model, params


# ---------------------------------------------------------------------------
# conversion from HF OwlViTForObjectDetection
# ---------------------------------------------------------------------------

def convert_owlvit_state_dict(sd: Mapping[str, Any], vision_depth: int = 12,
                              text_depth: int = 12) -> Dict[str, Any]:
    from .convert import _convert_encoder_layers, _np, _set

    p: Dict[str, Any] = {}
    _set(p, "vision/patch_embedding/kernel",
         _np(sd["owlvit.vision_model.embeddings.patch_embedding.weight"]
             ).transpose(2, 3, 1, 0))
    _set(p, "vision/class_embedding",
         _np(sd["owlvit.vision_model.embeddings.class_embedding"]).reshape(-1))
    _set(p, "vision/position_embedding",
         _np(sd["owlvit.vision_model.embeddings.position_embedding.weight"]))
    _set(p, "vision/pre_layernorm/scale",
         _np(sd["owlvit.vision_model.pre_layernorm.weight"]))
    _set(p, "vision/pre_layernorm/bias",
         _np(sd["owlvit.vision_model.pre_layernorm.bias"]))
    _convert_encoder_layers(sd, p, "owlvit.vision_model.encoder",
                            "vision/encoder", vision_depth)
    _set(p, "vision/post_layernorm/scale",
         _np(sd["owlvit.vision_model.post_layernorm.weight"]))
    _set(p, "vision/post_layernorm/bias",
         _np(sd["owlvit.vision_model.post_layernorm.bias"]))

    _set(p, "text/token_embedding/embedding",
         _np(sd["owlvit.text_model.embeddings.token_embedding.weight"]))
    _set(p, "text/position_embedding",
         _np(sd["owlvit.text_model.embeddings.position_embedding.weight"]))
    _convert_encoder_layers(sd, p, "owlvit.text_model.encoder",
                            "text/encoder", text_depth)
    _set(p, "text/final_layer_norm/scale",
         _np(sd["owlvit.text_model.final_layer_norm.weight"]))
    _set(p, "text/final_layer_norm/bias",
         _np(sd["owlvit.text_model.final_layer_norm.bias"]))
    _set(p, "text/text_projection/kernel",
         _np(sd["owlvit.text_projection.weight"]).T)

    _set(p, "merge_ln/scale", _np(sd["layer_norm.weight"]))
    _set(p, "merge_ln/bias", _np(sd["layer_norm.bias"]))
    for src, dst in (("class_head.dense0", "cls_dense0"),
                     ("class_head.logit_shift", "logit_shift"),
                     ("class_head.logit_scale", "logit_scale"),
                     ("box_head.dense0", "box_dense0"),
                     ("box_head.dense1", "box_dense1"),
                     ("box_head.dense2", "box_dense2")):
        _set(p, f"{dst}/kernel", _np(sd[f"{src}.weight"]).T)
        _set(p, f"{dst}/bias", _np(sd[f"{src}.bias"]))
    return p
