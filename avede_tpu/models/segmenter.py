"""Learnable segmentation model (compact U-Net).

Role model: the reference's segmentation stack — SAM-B (real code,
checkpoint never shipped, ``/root/reference/src/services/
object_detector.py:142-158``) with a "SAM 2.0" placeholder that is
actually GrabCut (``background_independent_detector.py:48-116``,
SURVEY.md §2.6.3). The rebuild keeps GrabCut as the always-available
host backend and adds this REAL, trainable U-Net as the device
backend: bbox-conditioned binary mask prediction, fully jittable,
trainable with ``segmentation_loss`` through the standard optax
machinery.

Input: image [N, S, S, 3] (0..1 floats) + bbox channel (a rendered
box-prior mask) → logits [N, S, S]. The box prior plays SAM's prompt
role in a convolutional formulation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SegmenterConfig:
    base: int = 32
    depth: int = 3
    image_size: int = 128
    dtype: str = "float32"

    @property
    def jnp_dtype(self) -> jnp.dtype:
        return jnp.dtype(self.dtype)


def tiny_segmenter_config() -> SegmenterConfig:
    return SegmenterConfig(base=8, depth=2, image_size=32)


class ConvBlock(nn.Module):
    ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(self.ch, (3, 3), padding="SAME", dtype=self.dtype,
                    name="c1")(x)
        x = nn.GroupNorm(num_groups=min(8, self.ch), dtype=self.dtype,
                         name="n1")(x)
        x = nn.silu(x)
        x = nn.Conv(self.ch, (3, 3), padding="SAME", dtype=self.dtype,
                    name="c2")(x)
        x = nn.GroupNorm(num_groups=min(8, self.ch), dtype=self.dtype,
                         name="n2")(x)
        return nn.silu(x)


class UNetSegmenter(nn.Module):
    cfg: SegmenterConfig

    @nn.compact
    def __call__(self, pixels: jax.Array,
                 box_prior: jax.Array) -> jax.Array:
        """pixels [N,S,S,3] in [0,1]; box_prior [N,S,S] in {0,1} →
        mask logits [N,S,S]."""
        cfg = self.cfg
        dt = cfg.jnp_dtype
        x = jnp.concatenate(
            [pixels.astype(dt), box_prior[..., None].astype(dt)], -1)
        skips = []
        ch = cfg.base
        for d in range(cfg.depth):
            x = ConvBlock(ch, dt, name=f"enc{d}")(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            ch *= 2
        x = ConvBlock(ch, dt, name="mid")(x)
        for d in reversed(range(cfg.depth)):
            ch //= 2
            n, h, w, _ = x.shape
            x = jax.image.resize(x, (n, h * 2, w * 2, x.shape[-1]),
                                 "nearest")
            x = jnp.concatenate([x, skips[d]], axis=-1)
            x = ConvBlock(ch, dt, name=f"dec{d}")(x)
        logits = nn.Conv(1, (1, 1), dtype=dt, name="out")(x)[..., 0]
        return logits.astype(jnp.float32)


def segmentation_loss(logits: jax.Array, masks: jax.Array) -> jax.Array:
    """BCE + soft-Dice."""
    import optax

    bce = optax.sigmoid_binary_cross_entropy(logits, masks).mean()
    p = jax.nn.sigmoid(logits)
    inter = (p * masks).sum(axis=(1, 2))
    dice = 1.0 - (2 * inter + 1.0) / (p.sum((1, 2)) + masks.sum((1, 2))
                                      + 1.0)
    return bce + dice.mean()


def render_box_prior(shape: Tuple[int, int], bbox,
                     size: int) -> np.ndarray:
    """bbox (source pixels) → binary prior at the model resolution."""
    h, w = shape
    prior = np.zeros((size, size), np.float32)
    x0 = int(bbox[0] / w * size)
    y0 = int(bbox[1] / h * size)
    x1 = max(int(bbox[2] / w * size), x0 + 1)
    y1 = max(int(bbox[3] / h * size), y0 + 1)
    prior[y0:y1, x0:x1] = 1.0
    return prior


def init_segmenter(cfg: Optional[SegmenterConfig] = None, seed: int = 0):
    cfg = cfg or SegmenterConfig()
    model = UNetSegmenter(cfg)
    rng = jax.random.PRNGKey(seed)
    px = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    prior = jnp.zeros((1, cfg.image_size, cfg.image_size), jnp.float32)
    params = model.init(rng, px, prior)["params"]
    return model, params
