"""Device-resident library index for serving-scale cross-video search.

``LibrarySearch`` (``library_search.py``) answers "find this query in
EVERY uploaded video". Its original formulation re-concatenated every
cached table and ran the score matmul on host numpy per request — fine
for tens of videos, hostile to production serving: at 1M cached frames
that is a >2 GB host copy plus a CPU matmul on every query.

TPU-native inversion: the library lives ON the chip as one bucketed
``[capacity, D]`` table (bfloat16 by default — 2× the resident capacity
of f32 at ≤1e-3 score drift, same budget the int8 *disk* tier of the
embedding cache already accepts; ``LIBRARY_INDEX_DTYPE="int8"`` opts
into per-row int8+scales for 4× capacity at the cache tier's drift).
Queries are one jitted ``matmul → mask → top_k`` program; only the
top-K indices/scores ever leave the device. Adds are incremental ``dynamic_update_slice`` writes
with donated buffers (no reallocation) into bucket-padded spans;
capacity grows by doubling with a single re-upload.

The reference has no analog (its architecture re-embeds per request —
``/root/reference/src/services/video_processor.py:387`` chain); this is
new capability surfaced at ``POST /api/search-library``.
"""

from __future__ import annotations

import bisect
import functools
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..ops.quant import quantize_rows_np as _quantize_rows
from ..utils.config import settings
from ..utils.logging import get_logger

logger = get_logger(__name__)

_ROW_BUCKET = 256          # adds are padded to this many rows
_MIN_CAPACITY = 1024


def _padded(n: int) -> int:
    """Rows occupied by an ``n``-row span after bucket padding."""
    return -(-n // _ROW_BUCKET) * _ROW_BUCKET


def _jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


@functools.lru_cache(maxsize=None)
def _write_fn():
    jax, jnp = _jax()

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def write(table, valid, block, vmask, offset):
        table = jax.lax.dynamic_update_slice(
            table, block.astype(table.dtype), (offset, 0))
        valid = jax.lax.dynamic_update_slice(valid, vmask, (offset,))
        return table, valid

    return write


@functools.lru_cache(maxsize=None)
def _write_fn_int8():
    jax, jnp = _jax()

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def write(table, scales, valid, qblock, sblock, vmask, offset):
        table = jax.lax.dynamic_update_slice(table, qblock, (offset, 0))
        scales = jax.lax.dynamic_update_slice(scales, sblock, (offset,))
        valid = jax.lax.dynamic_update_slice(valid, vmask, (offset,))
        return table, scales, valid

    return write


@functools.lru_cache(maxsize=None)
def _search_fn(k: int, int8: bool = False):
    jax, jnp = _jax()

    if int8:
        @jax.jit
        def search(table, scales, valid, q):
            # int8 rows dequantize in the matmul epilogue: bf16 cast for
            # the MXU, per-row scale fused by XLA
            s = jnp.dot(table.astype(jnp.bfloat16),
                        q.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) * scales
            s = jnp.where(valid, s, -jnp.inf)
            return jax.lax.top_k(s, k)
    else:
        @jax.jit
        def search(table, valid, q):
            s = jnp.dot(table, q.astype(table.dtype),
                        preferred_element_type=jnp.float32)
            s = jnp.where(valid, s, -jnp.inf)
            return jax.lax.top_k(s, k)

    return search


class DeviceLibraryIndex:
    """Incrementally-built, device-resident ``[capacity, D]`` embedding
    table with masked rows and O(1)-amortized adds.

    Rows for one video form a contiguous bucket-padded span; padding
    rows (and removed videos) are masked invalid and score ``-inf``.
    A host shadow backs capacity growth: float16 for the bf16 device
    tier (half the memory, strictly more precise than the bf16 device
    copy), float32 for the float32 and int8 tiers so growth never
    compounds a second rounding on top of the tier's own."""

    def __init__(self, dim: int, dtype: Optional[str] = None,
                 mesh=None) -> None:
        """``mesh`` (a ``parallel.mesh.MeshContext``) shards the table's
        rows over the data axis: each chip holds capacity/n_data rows,
        the score matmul runs shard-local, and XLA inserts the top-k
        merge collective over ICI — multi-chip serving without code
        changes (tested shard-invariant on the virtual 8-device mesh)."""
        self.dim = dim
        self.dtype = dtype or settings.LIBRARY_INDEX_DTYPE
        self._int8 = self.dtype == "int8"
        # int8 keeps a float32 host shadow: growth re-quantizes from the
        # shadow, and quantizing from f16-rounded values would compound
        # a second rounding the ≤1e-3 drift budget doesn't account for.
        # Only the bf16 device tier (whose own rounding dominates any
        # f16 shadow error) uses the half-memory f16 shadow.
        self._shadow_dtype = (np.float16 if self.dtype == "bfloat16"
                              else np.float32)
        self.mesh = mesh
        self._scales = None         # device [cap] f32 (int8 mode only)
        self._lock = threading.Lock()
        self._cap = 0
        self._table = None          # device [cap, D] self.dtype
        self._valid = None          # device [cap] bool
        self._shadow: Optional[np.ndarray] = None   # host [cap, D] f16
        self._shadow_valid: Optional[np.ndarray] = None
        # span bookkeeping (ordered by start row)
        self._starts: List[int] = []
        # (video_id, start_row, n_rows, timestamps, frame_indices)
        self._spans: List[Tuple[str, int, int, np.ndarray,
                                np.ndarray]] = []
        self._by_vid: Dict[str, int] = {}
        self._rows_end = 0          # first free row

    # ------------------------------------------------------------------
    @property
    def n_videos(self) -> int:
        return len(self._by_vid)

    @property
    def n_rows(self) -> int:
        """Valid (unmasked) rows currently searchable."""
        return int(sum(s[2] for s in self._spans))

    @property
    def capacity(self) -> int:
        return self._cap

    def has(self, video_id: str) -> bool:
        return video_id in self._by_vid

    def video_ids(self) -> List[str]:
        with self._lock:
            return list(self._by_vid)

    # ------------------------------------------------------------------
    def add(self, video_id: str, embeddings: np.ndarray,
            timestamps) -> None:
        """Insert (or replace) one video's unit-norm [N, D] table."""
        emb = np.asarray(embeddings, np.float32)
        if emb.ndim != 2 or emb.shape[1] != self.dim:
            raise ValueError(f"expected [N, {self.dim}], got {emb.shape}")
        ts = np.asarray(timestamps, np.float32)
        if len(ts) != len(emb):
            # a short ts array would silently shift/zero hit timestamps
            # after run-collapse (``_locate`` would fall back to 0.0) —
            # refuse up front instead of corrupting a user-visible field
            raise ValueError(
                f"timestamps length {len(ts)} != embeddings length "
                f"{len(emb)} for video {video_id!r}")
        frames = np.arange(len(emb), dtype=np.int32)
        if settings.LIBRARY_INDEX_DEDUP and len(emb) > 1:
            # lossless run collapse: the scan's duplicate-frame gating
            # scatters the SAME embedding to every frame of a static
            # run, so identical consecutive rows carry zero extra
            # information — keep the run head (its timestamp is the
            # run's first frame; every frame in the run scores equal).
            # ``frames`` preserves ORIGINAL sampled-frame indices so
            # hits report the same frame_index the host path would.
            keep = np.ones(len(emb), bool)
            keep[1:] = ~np.all(emb[1:] == emb[:-1], axis=1)
            if not keep.all():
                emb = emb[keep]
                frames = frames[keep]
                ts = ts[keep]
        with self._lock:
            n = len(emb)
            padded = _padded(n)
            if video_id in self._by_vid:
                # when this add will trigger growth anyway (removal
                # leaves a hole, it does not lower rows_end), skip the
                # hole's device zero-write — compaction discards it
                will_grow = n > 0 and self._rows_end + padded > self._cap
                self._remove_locked(video_id,
                                    device_write=not will_grow)
            if n == 0:
                return
            if self._rows_end + padded > self._cap:
                self._grow_locked(padded)
            start = self._rows_end
            block = np.zeros((padded, self.dim), np.float32)
            block[:n] = emb
            vmask = np.zeros((padded,), bool)
            vmask[:n] = True
            self._device_write_locked(block, vmask, start)
            self._shadow[start:start + padded] = \
                block.astype(self._shadow_dtype)
            self._shadow_valid[start:start + padded] = vmask
            idx = bisect.bisect_left(self._starts, start)
            self._starts.insert(idx, start)
            self._spans.insert(idx, (video_id, start, n, ts, frames))
            self._by_vid[video_id] = start
            self._rows_end = start + padded

    def remove(self, video_id: str) -> None:
        with self._lock:
            if video_id in self._by_vid:
                self._remove_locked(video_id)

    def _remove_locked(self, video_id: str,
                       device_write: bool = True) -> None:
        start = self._by_vid.pop(video_id)
        idx = self._starts.index(start)
        n = self._spans[idx][2]
        padded = _padded(n)
        del self._starts[idx]
        del self._spans[idx]
        if device_write:
            block = np.zeros((padded, self.dim), np.float32)
            vmask = np.zeros((padded,), bool)
            self._device_write_locked(block, vmask, start)
        self._shadow[start:start + padded] = 0
        self._shadow_valid[start:start + padded] = False
        # holes persist until the next capacity growth, which compacts

    # ------------------------------------------------------------------
    def search(self, query_embedding: np.ndarray, k: int
               ) -> List[Dict]:
        """Top-``k`` rows across the whole library for a unit-norm
        query. Returns dicts with video_id/timestamp/confidence/
        frame_index, best first."""
        _, jnp = _jax()
        q = jnp.asarray(np.asarray(query_embedding, np.float32))
        with self._lock:
            if self._table is None or not self._spans:
                return []
            # quantize k to a power of two so the per-k jit cache stays
            # a handful of programs even under adaptive widening
            k_prog = min(1 << (max(k, 1) - 1).bit_length(), self._cap)
            # DISPATCH under the lock: adds donate the table buffer to
            # their update program, which host-side marks the old array
            # deleted immediately — a search dispatched after that
            # raises "Array has been deleted". Once dispatched, the
            # device stream owns buffer lifetimes (in-order execution),
            # so only the enqueue needs mutual exclusion; the D2H
            # materialization happens outside the lock. (First use of a
            # new k_prog also compiles under the lock — accepted:
            # quantization bounds that to ~log(cap) compiles total.)
            if self._int8:
                scores, idx = _search_fn(k_prog, int8=True)(
                    self._table, self._scales, self._valid, q)
            else:
                scores, idx = _search_fn(k_prog)(
                    self._table, self._valid, q)
            starts = list(self._starts)
            spans = list(self._spans)
        scores = np.asarray(scores)[:k]
        idx = np.asarray(idx)[:k]
        out: List[Dict] = []
        for s, i in zip(scores, idx):
            if not np.isfinite(s):
                break
            vid, ts, frame = self._locate(int(i), starts, spans)
            out.append({"video_id": vid, "timestamp": float(ts),
                        "confidence": float(s), "frame_index": frame})
        return out

    @staticmethod
    def _locate(row: int, starts: List[int],
                spans: List[Tuple[str, int, int, np.ndarray,
                                  np.ndarray]]
                ) -> Tuple[str, float, int]:
        j = bisect.bisect_right(starts, row) - 1
        vid, start, n, ts, frames = spans[j]
        # ``add`` enforces len(ts) == len(frames) == n, and only the
        # first n rows of a span are valid (padding is masked), so a
        # returned row always indexes in range
        off = row - start
        return vid, float(ts[off]), int(frames[off])

    # ------------------------------------------------------------------
    def _grow_locked(self, extra_rows: int) -> None:
        """Grow capacity (doubling) and compact removal holes: spans are
        re-laid contiguously in the new shadow, then re-uploaded once."""
        _, jnp = _jax()
        compacted = sum(_padded(s[2]) for s in self._spans)
        new_cap = max(_MIN_CAPACITY, self._cap or _MIN_CAPACITY)
        while new_cap < compacted + extra_rows:
            new_cap *= 2
        if self.mesh is not None:       # rows must split evenly over
            # the data axis — round UP to a multiple (doubling never
            # reaches divisibility for non-power-of-2 axes, e.g. dp=3)
            d = self.mesh.n_data
            new_cap = -(-new_cap // d) * d
        shadow = np.zeros((new_cap, self.dim), self._shadow_dtype)
        shadow_valid = np.zeros((new_cap,), bool)
        new_starts: List[int] = []
        new_spans: List[Tuple[str, int, int, np.ndarray,
                              np.ndarray]] = []
        pos = 0
        for vid, start, n, ts, frames in self._spans:
            padded = _padded(n)
            shadow[pos:pos + padded] = self._shadow[start:start + padded]
            shadow_valid[pos:pos + padded] = \
                self._shadow_valid[start:start + padded]
            new_starts.append(pos)
            new_spans.append((vid, pos, n, ts, frames))
            self._by_vid[vid] = pos
            pos += padded
        self._shadow, self._shadow_valid = shadow, shadow_valid
        self._starts, self._spans = new_starts, new_spans
        self._rows_end = pos
        jax, _ = _jax()
        table_host = shadow.astype(np.float32)
        if self._int8:
            # quantize only the occupied prefix — the dead tail beyond
            # ``pos`` is masked invalid anyway, and this runs under the
            # index lock (half the stall at 50% occupancy)
            qtable = np.zeros((new_cap, self.dim), np.int8)
            qscales = np.full((new_cap,), 1e-12, np.float32)
            if pos:
                qtable[:pos], qscales[:pos] = \
                    _quantize_rows(table_host[:pos])
            arrays = {"_table": jnp.asarray(qtable),
                      "_scales": jnp.asarray(qscales),
                      "_valid": jnp.asarray(shadow_valid)}
            row_bytes = 1
        else:
            arrays = {"_table": jnp.asarray(table_host,
                                            dtype=self.dtype),
                      "_valid": jnp.asarray(shadow_valid)}
            row_bytes = 4 if self.dtype == "float32" else 2
        for name, arr in arrays.items():
            if self.mesh is not None:
                arr = jax.device_put(arr, self.mesh.data_sharded)
            setattr(self, name, arr)
        logger.info("library index capacity -> %d rows (%s, %.0f MB "
                    "on device)", new_cap, self.dtype,
                    new_cap * self.dim * row_bytes / 1e6)
        self._cap = new_cap

    def _device_write_locked(self, block: np.ndarray, vmask: np.ndarray,
                             offset: int) -> None:
        _, jnp = _jax()
        if self._int8:
            qblock, sblock = _quantize_rows(block)
            self._table, self._scales, self._valid = _write_fn_int8()(
                self._table, self._scales, self._valid,
                jnp.asarray(qblock), jnp.asarray(sblock),
                jnp.asarray(vmask), offset)
        else:
            self._table, self._valid = _write_fn()(
                self._table, self._valid, jnp.asarray(block),
                jnp.asarray(vmask), offset)
