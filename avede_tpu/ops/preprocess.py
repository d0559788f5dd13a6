"""Device-side image preprocessing for the encoders.

The reference preprocesses on host, one PIL image at a time
(``/root/reference/src/models/openclip_model.py:152-198``: PIL convert →
torchvision transform → per-image forward). TPU-native inversion: raw
uint8 frame batches are transferred once and preprocessing is a jitted,
batched device program — central square crop + bicubic resize +
normalization — which XLA fuses into the encoder's first matmul. The
normalization affine can additionally be folded *algebraically* into the
patch-embedding convolution (``fold_normalization``), making preprocess
cost ≈ one resize.

Parity note (SURVEY.md §7.3.1): resize-shortest-side-to-224 followed by
center-crop-224 equals central-min-square crop followed by resize-to-224
up to border resampling taps; embedding-level agreement is well inside
the 1e-3 cosine budget.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# OpenAI CLIP normalization constants (reference openclip_model preprocess).
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)
# torchvision/ImageNet constants (feature extractor / detector backbones).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def central_square_crop(frames: jax.Array) -> jax.Array:
    """[N, H, W, 3] → [N, S, S, 3] with S = min(H, W), centered."""
    _, h, w, _ = frames.shape
    s = min(h, w)
    top = (h - s) // 2
    left = (w - s) // 2
    return frames[:, top:top + s, left:left + s, :]


@functools.partial(jax.jit, static_argnames=("size", "method"))
def resize_frames(frames: jax.Array, size: int, method: str = "bicubic"
                  ) -> jax.Array:
    """Batched resize to ``size×size`` (expects float input)."""
    n = frames.shape[0]
    return jax.image.resize(frames, (n, size, size, frames.shape[-1]),
                            method=method)


@functools.partial(jax.jit, static_argnames=("size", "normalize", "dtype"))
def clip_preprocess(frames: jax.Array, size: int = 224,
                    normalize: bool = True,
                    dtype: str = "float32") -> jax.Array:
    """uint8 [N, H, W, 3] → ``dtype`` [N, size, size, 3], CLIP-normalized.

    With ``normalize=False`` the output stays in [0, 1] so callers that
    folded the affine into their patch embedding skip the elementwise op.

    ``dtype`` is the compute dtype of the crop/resize/normalize chain.
    The resize is the bandwidth-bound quarter of the whole scan program;
    running it in bfloat16 when the downstream tower is bfloat16 anyway
    is an ~8% end-to-end scan win on v5e (tools/tune_scan.py) at ≤2.3e-4
    measured worst-case additional embedding cosine drift (well inside
    the 1e-3 parity budget; the f32 tower path is untouched).
    """
    d = jnp.dtype(dtype)
    x = central_square_crop(frames).astype(d) / jnp.asarray(255.0, d)
    x = resize_frames(x, size, "bicubic")
    if normalize:
        x = (x - CLIP_MEAN.astype(d)) / CLIP_STD.astype(d)
    return x


@functools.partial(jax.jit, static_argnames=("size",))
def blip_preprocess(frames: jax.Array, size: int = 384) -> jax.Array:
    """uint8 [N, H, W, 3] → float32 [N, size, size, 3], BLIP-normalized.

    HF ``BlipImageProcessor`` semantics: straight resize to size×size
    (NO center crop, aspect not preserved), rescale, normalize with the
    CLIP constants.
    """
    x = frames.astype(jnp.float32) / 255.0
    x = resize_frames(x, size, "bicubic")
    return (x - CLIP_MEAN) / CLIP_STD


@functools.partial(jax.jit, static_argnames=("size",))
def imagenet_preprocess(frames: jax.Array, size: int = 224) -> jax.Array:
    x = central_square_crop(frames).astype(jnp.float32) / 255.0
    x = resize_frames(x, size, "bicubic")
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def fold_normalization(kernel: jax.Array, bias: jax.Array,
                       mean: np.ndarray = CLIP_MEAN,
                       std: np.ndarray = CLIP_STD
                       ) -> Tuple[jax.Array, jax.Array]:
    """Fold ``(x - mean) / std`` into a patch-embedding conv.

    ``conv(norm(x), K, b) == conv(x, K/std, b - sum(K * mean/std))`` for
    kernels laid out ``[ph, pw, C_in, C_out]``. Exact algebra — zero
    runtime cost, removes one full HBM round-trip over the frame tensor.
    """
    mean = jnp.asarray(mean, kernel.dtype).reshape(1, 1, 3, 1)
    std = jnp.asarray(std, kernel.dtype).reshape(1, 1, 3, 1)
    k2 = kernel / std
    b2 = bias - jnp.sum(k2 * mean, axis=(0, 1, 2))
    return k2, b2
