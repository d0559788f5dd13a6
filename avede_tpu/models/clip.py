"""CLIP ViT-B/32 image & text encoders in Flax.

Re-implements (not wraps) the model behind the reference's
``OpenCLIPModel`` (``/root/reference/src/models/openclip_model.py``):
the same OpenAI CLIP architecture — ViT-B/32 vision tower, 12-layer
causal text tower, projections to a shared 512-d space — with numerics
matching HuggingFace ``CLIPModel`` so converted torch checkpoints
reproduce reference embeddings to ≤1e-3 cosine (BASELINE.md bar).

TPU-first differences from the reference's usage:
- batched NHWC forward over whole frame tensors (the reference encodes
  one PIL image per forward, ``openclip_model.py:152-198``);
- bf16 compute / f32 params by default; unit-norm outputs computed
  on device;
- patchify is a strided-conv → reshaped matmul that XLA maps directly
  onto the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Transformer


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    image_size: int = 224
    patch_size: int = 32
    vision_dim: int = 768
    vision_depth: int = 12
    vision_heads: int = 12
    text_dim: int = 512
    text_depth: int = 12
    text_heads: int = 8
    vocab_size: int = 49408
    max_text_len: int = 77
    projection_dim: int = 512
    ln_eps: float = 1e-5
    dtype: str = "float32"
    use_flash: bool = False   # Pallas flash attention in the vision tower

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def jnp_dtype(self) -> jnp.dtype:
        return jnp.dtype(self.dtype)


def vit_b32() -> CLIPConfig:
    return CLIPConfig()


def tiny_test_config() -> CLIPConfig:
    """Small config for fast CPU tests."""
    return CLIPConfig(image_size=32, patch_size=8, vision_dim=64,
                      vision_depth=2, vision_heads=4, text_dim=64,
                      text_depth=2, text_heads=4, vocab_size=256,
                      max_text_len=16, projection_dim=32)


class CLIPVisionEncoder(nn.Module):
    """ViT tower → pooled, projected image embedding.

    Input: CLIP-normalized float [N, S, S, 3] (see ops/preprocess.py).
    Output: [N, projection_dim] (NOT unit-normalized; callers normalize).
    """

    cfg: CLIPConfig

    @nn.compact
    def __call__(self, pixels: Optional[jax.Array] = None,
                 patch_tokens: Optional[jax.Array] = None) -> jax.Array:
        """Either ``pixels`` [N, S, S, 3] (normalized floats; conv patch
        embedding runs here) or ``patch_tokens`` [N, P, D] (already
        embedded by the fused Pallas kernel — see
        ``ops/pallas_kernels.fused_patch_embed``)."""
        cfg = self.cfg
        dt = cfg.jnp_dtype
        if patch_tokens is not None:
            x = patch_tokens.astype(dt)
            n = x.shape[0]
        else:
            x = nn.Conv(cfg.vision_dim, (cfg.patch_size, cfg.patch_size),
                        strides=(cfg.patch_size, cfg.patch_size),
                        use_bias=False, dtype=dt,
                        name="patch_embedding")(pixels.astype(dt))
            n = x.shape[0]
            x = x.reshape(n, cfg.num_patches, cfg.vision_dim)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.vision_dim,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(dt), (n, 1, cfg.vision_dim)), x], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (cfg.num_patches + 1, cfg.vision_dim))
        x = x + pos.astype(dt)
        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=dt, name="pre_layernorm")(x)
        x = Transformer(cfg.vision_dim, cfg.vision_depth, cfg.vision_heads,
                        mlp_ratio=4.0, activation="quick_gelu",
                        ln_eps=cfg.ln_eps, dtype=dt,
                        use_flash=cfg.use_flash, name="encoder")(x)
        pooled = x[:, 0, :]
        pooled = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=dt,
                              name="post_layernorm")(pooled)
        out = nn.Dense(cfg.projection_dim, use_bias=False, dtype=dt,
                       name="projection")(pooled)
        return out.astype(jnp.float32)


class CLIPTextEncoder(nn.Module):
    """Causal text tower → pooled (EOT-token), projected text embedding.

    Input: int32 token ids [N, L] (EOT = highest id, HF convention: the
    pooled position is ``argmax(ids)``).
    """

    cfg: CLIPConfig

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        cfg = self.cfg
        dt = cfg.jnp_dtype
        if ids.shape[1] > cfg.max_text_len:
            raise ValueError(
                f"token sequence length {ids.shape[1]} exceeds model "
                f"max_text_len {cfg.max_text_len}; tokenize with "
                f"Tokenizer(context_len={cfg.max_text_len})")
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
        out = nn.Dense(cfg.projection_dim, use_bias=False, dtype=dt,
                       name="projection")(pooled)
        return out.astype(jnp.float32)


class CLIPModel(nn.Module):
    """Joint model; exposes image/text encoders and the logit scale."""

    cfg: CLIPConfig

    def setup(self) -> None:
        self.vision = CLIPVisionEncoder(self.cfg)
        self.text = CLIPTextEncoder(self.cfg)
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(2.6592), ())

    def __call__(self, pixels: jax.Array, ids: jax.Array
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        img = self.encode_image(pixels)
        txt = self.encode_text(ids)
        return img, txt, jnp.exp(self.logit_scale)

    def encode_image(self, pixels: jax.Array) -> jax.Array:
        emb = self.vision(pixels)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def encode_image_from_patches(self, patch_tokens: jax.Array
                                  ) -> jax.Array:
        """Continue the vision tower from pre-computed patch embeddings
        (the fused Pallas patchify+project kernel's output)."""
        emb = self.vision(patch_tokens=patch_tokens)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def encode_text(self, ids: jax.Array) -> jax.Array:
        emb = self.text(ids)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)


def init_clip(cfg: Optional[CLIPConfig] = None, seed: int = 0):
    """Build model + deterministic params (used when no checkpoint is
    available — the environment ships no pretrained weights)."""
    cfg = cfg or vit_b32()
    model = CLIPModel(cfg)
    rng = jax.random.PRNGKey(seed)
    pixels = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    ids = jnp.zeros((1, cfg.max_text_len), jnp.int32)
    params = model.init(rng, pixels, ids)["params"]
    return model, params
