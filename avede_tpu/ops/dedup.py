"""Duplicate-frame gating for the scan path.

Real footage is temporally redundant — surveillance and static-camera
video especially (the reference's target domain: its frame extractor
samples EVERY frame by default, ``src/services/frame_extractor.py:66``,
then CLIP-encodes each one). Embedding near-identical consecutive
frames is pure waste: this module detects runs of near-duplicates with
a cheap host-side signature (16×16 gray mean-abs-diff) and the embed
path runs the ViT only on run representatives, scattering each
representative's embedding back to every frame it stands for. The
per-frame embedding table keeps its full length, so windows, top-k,
caching and every downstream consumer are unchanged.

The gate is conservative by default (``settings.SCAN_DEDUP_EPS`` gray
levels of mean absolute difference at 16×16): frames that differ by
real motion never merge; compression noise and static scenes do.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import numpy as np

SIG_SIZE = 16


def frame_signature(frame: np.ndarray) -> np.ndarray:
    """uint8 [H, W, 3] → float32 [16, 16] gray thumbnail."""
    return _signatures(frame[None])[0]


def _signatures(frames: np.ndarray) -> np.ndarray:
    """uint8 [N, H, W, 3] (color) or [N, H, W] (gray/luma) → float32
    [N, 16, 16], vectorized and cheap: strided subsample to ≤2×SIG
    grid + channel mean first (≈50× less work than full-res
    cvtColor/INTER_AREA — the gate must cost far less than the ViT it
    skips), then one small resize per frame. The gray path serves the
    fused-pack scan, which gates on the i420 luma plane."""
    import cv2

    n, h, w = frames.shape[:3]
    sh = max(1, h // (2 * SIG_SIZE))
    sw = max(1, w // (2 * SIG_SIZE))
    small = frames[:, ::sh, ::sw]
    if frames.ndim == 4:
        small = small.mean(axis=3, dtype=np.float32)
    else:
        small = small.astype(np.float32)
    out = np.empty((n, SIG_SIZE, SIG_SIZE), np.float32)
    for i in range(n):
        out[i] = cv2.resize(small[i], (SIG_SIZE, SIG_SIZE),
                            interpolation=cv2.INTER_AREA)
    return out


class FrameDeduper:
    """Streaming near-duplicate gate.

    ``filter(chunk)`` returns the chunk's unique frames (possibly
    empty) and extends ``self.mapping`` with one representative index
    per input frame. After the stream, ``emb_unique[self.mapping]`` is
    the full-length embedding table.
    """

    def __init__(self, eps: float, signature_fn=None) -> None:
        self.eps = float(eps)
        self.mapping: List[int] = []
        self._prev_sig: Optional[np.ndarray] = None
        self._n_unique = 0
        # custom signature extractor: the fused-pack scan feeds PACKED
        # i420 chunks [N, S*3/2, S]; its gate signatures come from the
        # luma plane (frames[:, :S]) while filter() keeps full frames
        self._signature_fn = signature_fn or _signatures

    def filter(self, frames: np.ndarray) -> np.ndarray:
        if len(frames) == 0:
            return frames
        sigs = self._signature_fn(frames)
        keep = []
        for i in range(len(frames)):
            is_dup = (self._prev_sig is not None
                      and float(np.abs(sigs[i] - self._prev_sig).mean())
                      <= self.eps)
            if is_dup:
                self.mapping.append(self._n_unique - 1)
            else:
                keep.append(i)
                self.mapping.append(self._n_unique)
                self._n_unique += 1
                self._prev_sig = sigs[i]
        return frames[keep] if keep else frames[:0]

    @property
    def n_total(self) -> int:
        return len(self.mapping)

    @property
    def n_unique(self) -> int:
        return self._n_unique

    def scatter(self, emb_unique: np.ndarray) -> np.ndarray:
        """[n_unique, D] → [n_total, D] full per-frame table."""
        if emb_unique.shape[0] != self._n_unique:
            raise ValueError(
                f"expected {self._n_unique} unique embeddings, got "
                f"{emb_unique.shape[0]}")
        return emb_unique[np.asarray(self.mapping, np.int64)]


def rebatch(chunks, size: int) -> Iterator[np.ndarray]:
    """Coalesce an iterator of ``[c_i, ...]`` arrays into full
    ``[size, ...]`` chunks (last may be smaller), preserving order.

    The dedup gate shrinks stream chunks to arbitrary sizes (1..chunk);
    fed directly to ``ClipEngine.embed_stream`` each distinct padded
    bucket compiles a fresh XLA program and every tiny batch pays a
    full dispatch (plus tunnel RTT on this rig). Re-chunking keeps the
    whole scan on the ONE warm full-size program plus a single tail
    bucket (the round-2 bench measured the uncoalesced semi-static
    600-frame dedup scan at 10.2 s wall against 2.6 s for the plain
    scan — slower despite embedding 16× fewer frames)."""
    if size <= 0:
        raise ValueError(f"rebatch size must be positive, got {size}")
    buf: List[np.ndarray] = []
    count = 0
    for c in chunks:
        if len(c) == 0:
            continue
        buf.append(c)
        count += len(c)
        while count >= size:
            cat = np.concatenate(buf) if len(buf) > 1 else buf[0]
            yield cat[:size]
            rest = cat[size:]
            buf, count = ([rest], len(rest)) if len(rest) else ([], 0)
    if count:
        yield np.concatenate(buf) if len(buf) > 1 else buf[0]
