"""ctypes bindings for the native host kernels, with numpy fallbacks.

The library auto-builds on first import when a compiler is present
(build is a single translation unit, sub-second); otherwise every entry
point silently falls back to the numpy implementation in ``ops``, so
the framework never hard-depends on the toolchain.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional

import numpy as np

from ..utils.logging import get_logger

logger = get_logger(__name__)

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = Path(__file__).parent / "libhostops.so"
    if not so.exists():
        try:
            from .build import build

            build(verbose=False)
        except Exception as exc:  # noqa: BLE001 — fallback path exists
            logger.info("hostops build unavailable (%s); numpy fallbacks "
                        "in use", exc)
            return None
    try:
        lib = ctypes.CDLL(str(so))
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
        u64p = np.ctypeslib.ndpointer(np.uint64, flags="C")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
        i64 = ctypes.c_int64
        lib.phash_batch.argtypes = [u8p, i64, i64, i64, u64p]
        lib.hamming_batch.argtypes = [ctypes.c_uint64, u64p, i64, i32p]
        lib.pairwise_iou.argtypes = [f32p, i64, f32p, i64, f32p]
        lib.nms.argtypes = [f32p, f32p, i64, ctypes.c_float, i32p]
        lib.nms.restype = i64
        lib.temporal_dedup.argtypes = [f32p, f32p, i32p, i64,
                                       ctypes.c_float, ctypes.c_float, i32p]
        lib.temporal_dedup.restype = i64
        _LIB = lib
    except OSError as exc:
        logger.warning("hostops load failed: %s", exc)
    return _LIB


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# entry points (native with numpy fallback)
# ---------------------------------------------------------------------------

def phash_batch(gray_images: np.ndarray) -> np.ndarray:
    """[N, H, W] uint8 grayscale → [N] uint64 hashes."""
    lib = _load()
    imgs = np.ascontiguousarray(gray_images, np.uint8)
    n, h, w = imgs.shape
    if lib is not None:
        out = np.empty(n, np.uint64)
        lib.phash_batch(imgs, n, h, w, out)
        return out
    # numpy fallback via ops.image_feats bit packing
    from ..ops.image_feats import perceptual_hash

    bits = np.stack([perceptual_hash(im) for im in imgs])
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    return (bits.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)


def hamming_batch(query: int, hashes: np.ndarray) -> np.ndarray:
    lib = _load()
    hashes = np.ascontiguousarray(hashes, np.uint64)
    if lib is not None:
        out = np.empty(len(hashes), np.int32)
        lib.hamming_batch(ctypes.c_uint64(query), hashes, len(hashes), out)
        return out
    x = hashes ^ np.uint64(query)
    return np.unpackbits(x.view(np.uint8).reshape(len(hashes), 8),
                         axis=1).sum(1).astype(np.int32)


def pairwise_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _load()
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    if lib is not None:
        out = np.empty(len(a) * len(b), np.float32)
        lib.pairwise_iou(a, len(a), b, len(b), out)
        return out.reshape(len(a), len(b))
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area = lambda x: np.clip(x[:, 2] - x[:, 0], 0, None) * np.clip(
        x[:, 3] - x[:, 1], 0, None)
    union = area(a)[:, None] + area(b)[None, :] - inter
    return np.where(union > 1e-9, inter / union, 0.0).astype(np.float32)


def nms(boxes: np.ndarray, scores: np.ndarray,
        iou_threshold: float) -> np.ndarray:
    """→ kept indices (score-descending)."""
    lib = _load()
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    if lib is not None:
        keep = np.empty(len(boxes), np.int32)
        k = lib.nms(boxes, scores, len(boxes),
                    ctypes.c_float(iou_threshold), keep)
        return keep[:k].copy()
    iou = pairwise_iou(boxes, boxes)
    order = np.argsort(-scores)
    kept = []
    for i in order:
        if scores[i] <= -1e30:
            continue
        if all(iou[i, j] <= iou_threshold for j in kept):
            kept.append(i)
    return np.asarray(kept, np.int32)


def temporal_dedup(boxes: np.ndarray, times: np.ndarray,
                   query_ids: np.ndarray, time_window: float,
                   iou_threshold: float) -> np.ndarray:
    """Entries must be sorted best-first; → kept indices."""
    lib = _load()
    boxes = np.ascontiguousarray(boxes, np.float32)
    times = np.ascontiguousarray(times, np.float32)
    query_ids = np.ascontiguousarray(query_ids, np.int32)
    if lib is not None:
        keep = np.empty(len(boxes), np.int32)
        k = lib.temporal_dedup(boxes, times, query_ids, len(boxes),
                               ctypes.c_float(time_window),
                               ctypes.c_float(iou_threshold), keep)
        return keep[:k].copy()
    iou = pairwise_iou(boxes, boxes)
    kept = []
    for i in range(len(boxes)):
        dup = any(query_ids[i] == query_ids[j]
                  and abs(times[i] - times[j]) <= time_window
                  and iou[i, j] >= iou_threshold for j in kept)
        if not dup:
            kept.append(i)
    return np.asarray(kept, np.int32)
