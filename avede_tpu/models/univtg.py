"""Temporal grounding head (UniVTG-style) — a REAL model, replacing the
reference's mock.

The reference's ``UniVTGModel`` is a placeholder: random "video
features" + an untrained 3-MLP (``/root/reference/src/models/univtg_model.py:82-100,153-188``).
Only its *interface* is real and exercised by phase 3: candidate windows
→ refined ``(start_time, end_time, confidence)``, plus a direct
query→video grounding scan (``:196,363``).

This implementation keeps that interface but is an actual
video-temporal-grounding architecture in the UniVTG family (video+text
→ per-clip saliency + foreground boundary offsets):

- inputs: the CACHED CLIP frame embeddings (the per-frame features the
  rest of the framework already computes — no second feature extractor,
  unlike the reference's randn(T, 2048));
- text conditioning: CLIP text embedding fused multiplicatively after
  projection;
- a non-causal temporal transformer over frames with learned positions;
- heads: per-frame saliency logit and (left, right) boundary offsets in
  frame units (softplus ≥ 0) — the UniVTG formulation;
- trainable with ``grounding_loss`` (BCE saliency + L1 offsets inside
  foreground), through the same optax machinery as the CLIP tower.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Transformer


@dataclasses.dataclass(frozen=True)
class TemporalGroundingConfig:
    input_dim: int = 512            # CLIP projection dim
    hidden: int = 256
    depth: int = 4
    heads: int = 4
    max_frames: int = 1024          # matches MAX_FRAMES cap
    dtype: str = "float32"

    @property
    def jnp_dtype(self) -> jnp.dtype:
        return jnp.dtype(self.dtype)


def tiny_grounding_config(input_dim: int = 32) -> TemporalGroundingConfig:
    return TemporalGroundingConfig(input_dim=input_dim, hidden=32, depth=2,
                                   heads=2, max_frames=128)


class TemporalGroundingHead(nn.Module):
    cfg: TemporalGroundingConfig

    @nn.compact
    def __call__(self, frame_emb: jax.Array, text_emb: jax.Array,
                 valid: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array]:
        """frame_emb [B, N, D], text_emb [B, D], valid [B, N] →
        (saliency logits [B, N], offsets [B, N, 2] ≥ 0 in frame units)."""
        cfg = self.cfg
        dt = cfg.jnp_dtype
        B, N, _ = frame_emb.shape
        v = nn.Dense(cfg.hidden, dtype=dt, name="video_proj")(
            frame_emb.astype(dt))
        t = nn.Dense(cfg.hidden, dtype=dt, name="text_proj")(
            text_emb.astype(dt))
        x = v * (1.0 + t[:, None, :]) + t[:, None, :]   # FiLM-style fusion
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (cfg.max_frames, cfg.hidden))
        x = x + pos[None, :N, :].astype(dt)
        mask = valid if valid is not None else jnp.ones((B, N), bool)
        x = Transformer(cfg.hidden, cfg.depth, cfg.heads, mlp_ratio=4.0,
                        activation="gelu", dtype=dt, name="encoder")(
            x, mask=mask)
        sal = nn.Dense(1, dtype=dt, name="saliency")(x)[..., 0]
        off = jax.nn.softplus(
            nn.Dense(2, dtype=dt, name="boundaries")(x))
        neg = jnp.finfo(jnp.float32).min
        sal = jnp.where(mask, sal.astype(jnp.float32), neg)
        return sal, off.astype(jnp.float32)


def grounding_loss(saliency: jax.Array, offsets: jax.Array,
                   sal_labels: jax.Array, off_labels: jax.Array,
                   valid: jax.Array) -> jax.Array:
    """BCE on saliency + L1 on boundary offsets inside foreground."""
    bce = optax_sigmoid_bce(saliency, sal_labels)
    bce = jnp.where(valid, bce, 0.0).sum() / jnp.maximum(valid.sum(), 1)
    fg = (sal_labels > 0.5) & valid
    l1 = jnp.abs(offsets - off_labels).sum(-1)
    l1 = jnp.where(fg, l1, 0.0).sum() / jnp.maximum(fg.sum(), 1)
    return bce + l1


def optax_sigmoid_bce(logits: jax.Array, labels: jax.Array) -> jax.Array:
    import optax

    return optax.sigmoid_binary_cross_entropy(logits, labels)


def init_grounding(cfg: Optional[TemporalGroundingConfig] = None,
                   seed: int = 0):
    cfg = cfg or TemporalGroundingConfig()
    model = TemporalGroundingHead(cfg)
    rng = jax.random.PRNGKey(seed)
    fe = jnp.zeros((1, 8, cfg.input_dim), jnp.float32)
    te = jnp.zeros((1, cfg.input_dim), jnp.float32)
    params = model.init(rng, fe, te)["params"]
    return model, params
