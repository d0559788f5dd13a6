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


# ---------------------------------------------------------------------------
# Compact transfer codec (host pack → device unpack)
#
# On a bandwidth-limited host→device link the cold scan is TRANSFER
# bound: 600 frames of 512×288 RGB = 265 MB (measured 7.3 s through
# this rig's ~35 MB/s tunneled chip — the whole round-2 cold-path
# wall). Source video is 4:2:0 anyway, so re-subsampling chroma loses
# almost nothing: the host packs frames at the model's input geometry
# as full-range BT.601 I420 (size²·1.5 bytes = 75 KB/frame at 224, a
# 5.9× byte reduction vs shipping 512×288 RGB), and the device unpacks
# YUV→RGB fused into the normalization. Full range (not cv2's
# limited-range studio swing) keeps all 256 luma levels.
# ---------------------------------------------------------------------------

_YUV_W = np.array([[0.299, 0.587, 0.114],
                   [-0.168736, -0.331264, 0.5],
                   [0.5, -0.418688, -0.081312]], np.float32)


def pack_frames_i420(frames: np.ndarray, size: int,
                     src: str = "rgb") -> np.ndarray:
    """uint8 RGB [N, H, W, 3] → packed I420 uint8 [N, size*3//2, size].

    ``src="bgr"`` accepts decoder-native BGR chunks and folds the
    channel swap into the color matrix (columns reordered) — EXACTLY
    the same output bytes as the RGB path, with the decode thread's
    per-frame BGR→RGB pass deleted (crop/resize are per-channel ops, so
    they commute with channel order).

    Host side of the compact transfer: central square crop + resize to
    the model geometry (cv2 INTER_AREA — the antialiased downscale,
    closest to the device path's antialiased bicubic on
    high-frequency content: measured min-cosine 0.9974 vs 0.9847 for
    INTER_CUBIC on worst-case decoded noise), then full-range BT.601 with 2×2 mean-pooled chroma.
    Vectorized over the whole chunk; runs on the decode/prefetch
    threads so it overlaps device compute."""
    import cv2

    n = frames.shape[0]
    small = pack_frames_rgb(frames, size)
    # one C-speed 3×4 affine over the whole chunk (cv2.transform
    # saturates to uint8; proper YCbCr coefficients are range-safe —
    # cv2's own COLOR_RGB2YUV uses the analog 0.877/0.492 scales and
    # CLIPS saturated reds/blues, hence the explicit matrix). The
    # earlier float-numpy formulation cost ~6.5 ms/frame in chunk-sized
    # float32 allocations; this is ~0.6 ms/frame.
    w = _YUV_W if src == "rgb" else _YUV_W[:, ::-1]
    m = np.hstack([w, np.array([[0.0], [128.0], [128.0]],
                               np.float32)])
    yuv = cv2.transform(small.reshape(n * size, size, 3), m).reshape(
        n, size, size, 3)
    out = np.empty((n, size * 3 // 2, size), np.uint8)
    out[:, :size] = yuv[..., 0]
    h2, q = size // 2, size // 4
    # 2×2 chroma mean-pool (what the source 4:2:0 video already did);
    # INTER_AREA at exactly 2× downscale IS the 2×2 box mean
    for i in range(n):
        out[i, size:size + q] = cv2.resize(
            yuv[i, :, :, 1], (h2, h2),
            interpolation=cv2.INTER_AREA).reshape(q, size)
        out[i, size + q:] = cv2.resize(
            yuv[i, :, :, 2], (h2, h2),
            interpolation=cv2.INTER_AREA).reshape(q, size)
    return out


def pack_frames_rgb(frames: np.ndarray, size: int) -> np.ndarray:
    """uint8 RGB [N, H, W, 3] → [N, size, size, 3]: the ``rgb``
    compact-transfer mode — host crop+resize only (2.9× fewer bytes
    than full frames at 512×288, no chroma subsampling)."""
    import cv2

    n, h, w = frames.shape[:3]
    if (h, w) == (size, size):
        return frames
    s = min(h, w)
    top, left = (h - s) // 2, (w - s) // 2
    sq = frames[:, top:top + s, left:left + s]
    small = np.empty((n, size, size, 3), np.uint8)
    for i in range(n):
        cv2.resize(sq[i], (size, size), dst=small[i],
                   interpolation=cv2.INTER_AREA)
    return small


@functools.partial(jax.jit, static_argnames=("normalize", "dtype"))
def clip_preprocess_i420(packed: jax.Array, normalize: bool = True,
                         dtype: str = "float32") -> jax.Array:
    """Packed I420 uint8 [N, S*3/2, S] → ``dtype`` [N, S, S, 3], CLIP
    normalized — the device half of the compact transfer. Chroma
    upsamples 2× nearest; the YUV→RGB matrix and the CLIP affine fuse
    into one elementwise program (and onward into the patch conv)."""
    d = jnp.dtype(dtype)
    n, hp, s = packed.shape
    assert hp == s * 3 // 2, (hp, s)
    h2 = s // 2
    y = packed[:, :s, :].astype(d)
    u = packed[:, s:s + s // 4, :].reshape(n, h2, h2).astype(d) - 128.0
    v = packed[:, s + s // 4:, :].reshape(n, h2, h2).astype(d) - 128.0
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2)
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    x = jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0) \
        / jnp.asarray(255.0, d)
    if normalize:
        x = (x - CLIP_MEAN.astype(d)) / CLIP_STD.astype(d)
    return x


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
