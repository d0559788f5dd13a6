"""BLIP-2 Q-Former image-text retrieval model (Flax).

The reference optionally runs BLIP-2 for phase-2 reranking when
``settings.BLIP_MODEL`` contains "blip2"
(``/root/reference/src/models/blip_model.py:184-197``), and
BASELINE.json names "phase2_reranker: BLIP-2 Q-Former rerank" as a
benchmark config. This implements the BLIP-2 stage-1 retrieval model
(HF ``Blip2ForImageTextRetrieval``):

- the BLIP-flavor ViT (fused qkv — shared with ``models/blip.py``);
- a Q-Former: learned query tokens self-attending and cross-attending
  to frozen vision features every ``cross_frequency`` layers, with
  separate query/text FFN branches (BERT post-LN);
- ITC scoring: max over query tokens of cosine(vision_proj(query_out),
  text_proj(text_out[CLS])) — used directly as the rerank signal, which
  is *stronger* than the reference's caption-then-compare roundtrip.

Numerics match HF (tests/test_qformer_parity.py) so the public
``blip2-itm-vit-g`` checkpoint converts directly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blip import BertAttention, BlipConfig, BlipVisionEncoder


@dataclasses.dataclass(frozen=True)
class QFormerConfig:
    # vision tower (BLIP-2 uses a ViT-g in the release; shape-param'd)
    image_size: int = 224
    patch_size: int = 14
    vision_dim: int = 1408
    vision_depth: int = 39
    vision_heads: int = 16
    vision_mlp: int = 6144
    vision_ln_eps: float = 1e-5
    # q-former
    hidden: int = 768
    depth: int = 12
    heads: int = 12
    mlp: int = 3072
    cross_frequency: int = 2
    vocab_size: int = 30523
    max_pos: int = 512
    ln_eps: float = 1e-12
    use_text_input: bool = True
    num_query_tokens: int = 32
    projection_dim: int = 256
    dtype: str = "float32"

    @property
    def jnp_dtype(self) -> jnp.dtype:
        return jnp.dtype(self.dtype)

    @property
    def vision_cfg(self) -> BlipConfig:
        return BlipConfig(
            image_size=self.image_size, patch_size=self.patch_size,
            vision_dim=self.vision_dim, vision_depth=self.vision_depth,
            vision_heads=self.vision_heads, vision_mlp=self.vision_mlp,
            vision_ln_eps=self.vision_ln_eps,
            # text fields unused by the vision tower
            text_dim=self.hidden, text_depth=1, text_heads=1,
            text_mlp=self.mlp, dtype=self.dtype)

    @property
    def text_attn_cfg(self) -> BlipConfig:
        """Shape carrier for BertAttention reuse."""
        return BlipConfig(text_dim=self.hidden, text_heads=self.heads,
                          text_ln_eps=self.ln_eps, dtype=self.dtype)


def tiny_qformer_config() -> QFormerConfig:
    return QFormerConfig(image_size=32, patch_size=8, vision_dim=64,
                         vision_depth=2, vision_heads=4, vision_mlp=128,
                         hidden=64, depth=2, heads=4, mlp=128,
                         cross_frequency=2, vocab_size=100, max_pos=32,
                         num_query_tokens=4, projection_dim=24)


class QFormerLayer(nn.Module):
    cfg: QFormerConfig
    has_cross: bool

    @nn.compact
    def __call__(self, x: jax.Array, vision: Optional[jax.Array],
                 self_mask: Optional[jax.Array],
                 query_length: int) -> jax.Array:
        cfg = self.cfg
        dt = cfg.jnp_dtype
        eps = cfg.ln_eps
        acfg = cfg.text_attn_cfg

        o, _ = BertAttention(acfg, name="self_attn")(x, x, self_mask)
        o = nn.Dense(cfg.hidden, dtype=dt, name="self_output")(o)
        x = nn.LayerNorm(epsilon=eps, dtype=dt, name="self_ln")(x + o)

        def ffn_query(h):
            y = nn.Dense(cfg.mlp, dtype=dt, name="intermediate_query")(h)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(cfg.hidden, dtype=dt, name="output_query")(y)
            return nn.LayerNorm(epsilon=eps, dtype=dt,
                                name="output_query_ln")(h + y)

        def ffn_text(h):
            y = nn.Dense(cfg.mlp, dtype=dt, name="intermediate")(h)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(cfg.hidden, dtype=dt, name="output")(y)
            return nn.LayerNorm(epsilon=eps, dtype=dt,
                                name="output_ln")(h + y)

        if query_length > 0:
            q = x[:, :query_length, :]
            if self.has_cross:
                o, _ = BertAttention(acfg, cross=True,
                                     name="cross_attn")(q, vision, None)
                o = nn.Dense(cfg.hidden, dtype=dt, name="cross_output")(o)
                q = nn.LayerNorm(epsilon=eps, dtype=dt,
                                 name="cross_ln")(q + o)
            out = ffn_query(q)
            if x.shape[1] > query_length:
                out = jnp.concatenate(
                    [out, ffn_text(x[:, query_length:, :])], axis=1)
            return out
        return ffn_text(x)


class QFormer(nn.Module):
    """The transformer stack; input is pre-embedded (queries and/or
    text), ``query_length`` static per call."""

    cfg: QFormerConfig

    @nn.compact
    def __call__(self, embeds: jax.Array, vision: Optional[jax.Array],
                 self_mask: Optional[jax.Array],
                 query_length: int) -> jax.Array:
        x = nn.LayerNorm(epsilon=self.cfg.ln_eps, dtype=self.cfg.jnp_dtype,
                         name="input_ln")(embeds)
        for i in range(self.cfg.depth):
            x = QFormerLayer(self.cfg,
                             has_cross=(i % self.cfg.cross_frequency == 0),
                             name=f"layers_{i}")(
                x, vision, self_mask, query_length)
        return x


class Blip2Retrieval(nn.Module):
    """Full ITC/ITM retrieval model."""

    cfg: QFormerConfig

    def setup(self) -> None:
        cfg = self.cfg
        dt = cfg.jnp_dtype
        self.vision = BlipVisionEncoder(cfg.vision_cfg)
        self.qformer = QFormer(cfg)
        self.query_tokens = self.param(
            "query_tokens", nn.initializers.normal(0.02),
            (cfg.num_query_tokens, cfg.hidden))
        self.word_embeddings = self.param(
            "word_embeddings", nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.hidden))
        self.position_embeddings = self.param(
            "position_embeddings", nn.initializers.normal(0.02),
            (cfg.max_pos, cfg.hidden))
        self.vision_projection = nn.Dense(cfg.projection_dim, dtype=dt)
        self.text_projection = nn.Dense(cfg.projection_dim, dtype=dt)
        self.itm_head = nn.Dense(2, dtype=dt)

    def image_embeds(self, pixels: jax.Array) -> jax.Array:
        """→ normalized per-query embeddings [B, Q, proj]."""
        v = self.vision(pixels)
        B = pixels.shape[0]
        q = jnp.broadcast_to(self.query_tokens[None],
                             (B,) + self.query_tokens.shape)
        out = self.qformer(q, v, None,
                           query_length=self.cfg.num_query_tokens)
        proj = self.vision_projection(out)
        return proj / (jnp.linalg.norm(proj, axis=-1, keepdims=True) + 1e-9)

    def text_embeds(self, ids: jax.Array,
                    mask: Optional[jax.Array] = None) -> jax.Array:
        """→ normalized CLS embedding [B, proj]."""
        x = jnp.take(self.word_embeddings, ids, axis=0)
        x = x + self.position_embeddings[None, : ids.shape[1], :]
        if mask is None:
            mask = (ids != 0)
        # BertAttention expects a [B, 1, 1, K]-broadcastable mask
        out = self.qformer(x, None, mask[:, None, None, :], query_length=0)
        proj = self.text_projection(out[:, 0, :])
        return proj / (jnp.linalg.norm(proj, axis=-1, keepdims=True) + 1e-9)

    def __call__(self, pixels: jax.Array, ids: jax.Array,
                 mask: Optional[jax.Array] = None) -> jax.Array:
        """ITC logits_per_image [B_img, B_txt]: max over query tokens."""
        img = self.image_embeds(pixels)
        txt = self.text_embeds(ids, mask)
        sims = jnp.einsum("bqd,td->bqt", img, txt,
                          preferred_element_type=jnp.float32)
        return jnp.max(sims, axis=1)


def init_blip2(cfg: Optional[QFormerConfig] = None, seed: int = 0):
    cfg = cfg or QFormerConfig()
    model = Blip2Retrieval(cfg)
    rng = jax.random.PRNGKey(seed)
    px = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    ids = jnp.ones((1, 4), jnp.int32)
    params = model.init(rng, px, ids)["params"]
    return model, params


# ---------------------------------------------------------------------------
# conversion from HF Blip2ForImageTextRetrieval
# ---------------------------------------------------------------------------

def convert_blip2_state_dict(sd: Mapping[str, Any], cfg: QFormerConfig
                             ) -> Dict[str, Any]:
    from .convert import _np, _set

    p: Dict[str, Any] = {}
    # vision tower (BLIP fused-qkv layout)
    _set(p, "vision/patch_embedding/kernel",
         _np(sd["vision_model.embeddings.patch_embedding.weight"]
             ).transpose(2, 3, 1, 0))
    _set(p, "vision/patch_embedding/bias",
         _np(sd["vision_model.embeddings.patch_embedding.bias"]))
    _set(p, "vision/class_embedding",
         _np(sd["vision_model.embeddings.class_embedding"]).reshape(-1))
    _set(p, "vision/position_embedding",
         _np(sd["vision_model.embeddings.position_embedding"])[0])
    for i in range(cfg.vision_depth):
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

    _set(p, "query_tokens", _np(sd["query_tokens"])[0])
    _set(p, "word_embeddings", _np(sd["embeddings.word_embeddings.weight"]))
    _set(p, "position_embeddings",
         _np(sd["embeddings.position_embeddings.weight"]))
    _set(p, "qformer/input_ln/scale", _np(sd["qformer.layernorm.weight"]))
    _set(p, "qformer/input_ln/bias", _np(sd["qformer.layernorm.bias"]))
    for i in range(cfg.depth):
        s = f"qformer.encoder.layer.{i}"
        d = f"qformer/layers_{i}"
        for proj in ("query", "key", "value"):
            _set(p, f"{d}/self_attn/{proj}/kernel",
                 _np(sd[f"{s}.attention.attention.{proj}.weight"]).T)
            _set(p, f"{d}/self_attn/{proj}/bias",
                 _np(sd[f"{s}.attention.attention.{proj}.bias"]))
        _set(p, f"{d}/self_output/kernel",
             _np(sd[f"{s}.attention.output.dense.weight"]).T)
        _set(p, f"{d}/self_output/bias",
             _np(sd[f"{s}.attention.output.dense.bias"]))
        _set(p, f"{d}/self_ln/scale",
             _np(sd[f"{s}.attention.output.LayerNorm.weight"]))
        _set(p, f"{d}/self_ln/bias",
             _np(sd[f"{s}.attention.output.LayerNorm.bias"]))
        if i % cfg.cross_frequency == 0:
            for proj in ("query", "key", "value"):
                _set(p, f"{d}/cross_attn/{proj}/kernel",
                     _np(sd[f"{s}.crossattention.attention.{proj}.weight"]).T)
                _set(p, f"{d}/cross_attn/{proj}/bias",
                     _np(sd[f"{s}.crossattention.attention.{proj}.bias"]))
            _set(p, f"{d}/cross_output/kernel",
                 _np(sd[f"{s}.crossattention.output.dense.weight"]).T)
            _set(p, f"{d}/cross_output/bias",
                 _np(sd[f"{s}.crossattention.output.dense.bias"]))
            _set(p, f"{d}/cross_ln/scale",
                 _np(sd[f"{s}.crossattention.output.LayerNorm.weight"]))
            _set(p, f"{d}/cross_ln/bias",
                 _np(sd[f"{s}.crossattention.output.LayerNorm.bias"]))
        _set(p, f"{d}/intermediate_query/kernel",
             _np(sd[f"{s}.intermediate_query.dense.weight"]).T)
        _set(p, f"{d}/intermediate_query/bias",
             _np(sd[f"{s}.intermediate_query.dense.bias"]))
        _set(p, f"{d}/output_query/kernel",
             _np(sd[f"{s}.output_query.dense.weight"]).T)
        _set(p, f"{d}/output_query/bias",
             _np(sd[f"{s}.output_query.dense.bias"]))
        _set(p, f"{d}/output_query_ln/scale",
             _np(sd[f"{s}.output_query.LayerNorm.weight"]))
        _set(p, f"{d}/output_query_ln/bias",
             _np(sd[f"{s}.output_query.LayerNorm.bias"]))
        if f"{s}.intermediate.dense.weight" in sd:
            _set(p, f"{d}/intermediate/kernel",
                 _np(sd[f"{s}.intermediate.dense.weight"]).T)
            _set(p, f"{d}/intermediate/bias",
                 _np(sd[f"{s}.intermediate.dense.bias"]))
            _set(p, f"{d}/output/kernel",
                 _np(sd[f"{s}.output.dense.weight"]).T)
            _set(p, f"{d}/output/bias", _np(sd[f"{s}.output.dense.bias"]))
            _set(p, f"{d}/output_ln/scale",
                 _np(sd[f"{s}.output.LayerNorm.weight"]))
            _set(p, f"{d}/output_ln/bias",
                 _np(sd[f"{s}.output.LayerNorm.bias"]))
    for src, dst in (("vision_projection", "vision_projection"),
                     ("text_projection", "text_projection"),
                     ("itm_head", "itm_head")):
        _set(p, f"{dst}/kernel", _np(sd[f"{src}.weight"]).T)
        _set(p, f"{dst}/bias", _np(sd[f"{src}.bias"]))
    return p
