"""The frame-embedding engine — heart of the TPU-native design.

Replaces the reference's hot loop (one 224×224 torch forward per window,
``/root/reference/src/pipeline/phase1_mvp.py:74-121`` +
``openclip_model.py:152-198``) with: pad the whole frame stack to a
compile bucket, shard it over the mesh's data axis, and run ONE jitted
program = fused preprocess → ViT → unit-norm. Compilations are cached
per (bucket, H, W) shape; ragged videos hit a handful of buckets
(SURVEY.md §7.3.3). Text encoding ties the tokenizer's context length to
the model config (pairing the reference leaves implicit).
"""

from __future__ import annotations

import functools
import threading
from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import CLIPConfig, CLIPModel, init_clip, vit_b32
from ..models.convert import load_params
from ..models.tokenizer import Tokenizer
from ..ops.preprocess import (clip_preprocess, clip_preprocess_i420,
                              pack_frames_i420, pack_frames_rgb)
from ..utils.config import settings
from ..utils.logging import get_logger
from .mesh import MeshContext, get_mesh, pick_bucket

logger = get_logger(__name__)


class ClipEngine:
    """Batched, mesh-sharded CLIP inference with host↔device plumbing."""

    def __init__(self, cfg: Optional[CLIPConfig] = None,
                 params: Optional[dict] = None,
                 mesh: Optional[MeshContext] = None,
                 weights_path: Optional[str] = None,
                 image_size: Optional[int] = None) -> None:
        if cfg is None:
            from ..utils.platform import with_compute_dtype

            cfg = with_compute_dtype(vit_b32())
        self.cfg = cfg
        if image_size is not None and image_size != self.cfg.image_size:
            self.cfg = CLIPConfig(**{**self.cfg.__dict__,
                                     "image_size": image_size})
        self.mesh = mesh or get_mesh()
        weights_path = weights_path or settings.CLIP_WEIGHTS
        if params is not None:
            self.model = CLIPModel(self.cfg)
            self.params = params
            # fingerprint external params: two engines with different
            # weights must not share embedding-cache entries (md5, not
            # hash() — the cache is cross-process and hash() is salted)
            import hashlib

            leaf = np.asarray(
                jax.tree.leaves(params)[0], np.float32).reshape(-1)[:64]
            self._tag = ("external:"
                         + hashlib.md5(leaf.tobytes()).hexdigest()[:8])
        elif weights_path:
            self.model = CLIPModel(self.cfg)
            self.params = load_params(weights_path)
            self._tag = f"clip:{weights_path}"
            logger.info("CLIP weights loaded from %s", weights_path)
        else:
            self.model, self.params = init_clip(self.cfg, seed=0)
            self._tag = "clip:random-init"
            logger.info("CLIP randomly initialised (no checkpoint "
                        "configured — this image ships no weights)")
        self.tokenizer = Tokenizer(vocab_size=self.cfg.vocab_size,
                                   context_len=self.cfg.max_text_len)
        # params replicated across the mesh once, up front
        self.params = jax.device_put(self.params, self.mesh.replicated)
        self._image_fns: Dict[Tuple[int, int, int], object] = {}
        self._text_fn = None
        self._px_fn = None
        self._batcher = None
        # concurrent API requests share one engine; building jitted fns
        # must not race (the reference guards model loads the same way,
        # universal_detector.py:118)
        self._lock = threading.Lock()
        # LRU text-embedding cache: serving repeats the same queries;
        # a hit skips tokenize + text-tower forward entirely
        self._text_cache: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self._query_topk_fn = None
        # device-resident score tables (identity-keyed LRU): repeated
        # warm queries against the same host embedding table must not
        # re-upload it every time (1.2 MB/query ≈ 35 ms through the
        # tunneled chip; the host cache returns the SAME array object
        # for repeat queries, so identity is a sound key)
        self._table_lru: "OrderedDict[int, tuple]" = OrderedDict()

    @property
    def model_tag(self) -> str:
        # the transfer codec changes embedding values (≤2e-4 on video
        # content, more on synthetic noise) — cached tables from one
        # codec must not serve another
        mode = settings.SCAN_TRANSFER
        suffix = "" if mode == "full" else f"|{mode}"
        return f"{self._tag}|{self.cfg.image_size}px{suffix}"

    # ------------------------------------------------------------------
    def _pack_transfer(self, part: np.ndarray) -> np.ndarray:
        """Host half of the compact transfer codec (``SCAN_TRANSFER``):
        shrink whole-frame batches to the model's input geometry before
        the host→device copy. No-op for 'full' or already-packed
        input. Runs on decode/prefetch threads, overlapping device
        compute."""
        mode = settings.SCAN_TRANSFER
        if part.ndim != 4 or part.shape[-1] != 3:
            return part          # already packed
        if mode == "i420" and self.cfg.image_size % 4 == 0:
            return pack_frames_i420(part, self.cfg.image_size)
        if mode == "rgb":
            return pack_frames_rgb(part, self.cfg.image_size)
        return part

    # ------------------------------------------------------------------
    def _use_pallas(self) -> bool:
        if not settings.USE_PALLAS:
            return False
        try:
            return jax.devices()[0].platform not in ("cpu", "gpu")
        except Exception:  # noqa: BLE001
            return False

    def _image_fn(self, shape: Tuple[int, int, int]):
        with self._lock:
            return self._image_fn_locked(shape)

    def _image_fn_locked(self, shape: Tuple[int, int, int]):
        if shape not in self._image_fns:
            model = self.model
            size = self.cfg.image_size
            dtype = self.cfg.dtype
            use_pallas = self._use_pallas()

            packed_i420 = len(shape) == 2   # [S*3/2, S] per frame

            @functools.partial(
                jax.jit,
                in_shardings=(self.mesh.replicated, self.mesh.data_sharded),
                out_shardings=self.mesh.data_sharded)
            def run(params, frames_u8):
                if use_pallas:
                    # fused path: resize keeps 0..255 range; /255 +
                    # normalize + patchify + project fuse into one
                    # Pallas kernel (ops/pallas_kernels.py)
                    from ..ops.pallas_kernels import fused_patch_embed
                    from ..ops.preprocess import (central_square_crop,
                                                  resize_frames)

                    if packed_i420:
                        x = clip_preprocess_i420(
                            frames_u8, normalize=False) * 255.0
                    else:
                        x = central_square_crop(frames_u8).astype(
                            jnp.float32)
                        x = resize_frames(x, size, "bicubic")
                    k = params["vision"]["patch_embedding"]["kernel"]
                    tokens = fused_patch_embed(
                        x, k, jnp.zeros((k.shape[-1],), jnp.float32))
                    return model.apply(
                        {"params": params}, tokens,
                        method=model.encode_image_from_patches)
                if packed_i420:
                    px = clip_preprocess_i420(frames_u8, dtype=dtype)
                else:
                    px = clip_preprocess(frames_u8, size=size, dtype=dtype)
                return model.apply({"params": params}, px,
                                   method=model.encode_image)

            self._image_fns[shape] = run
        return self._image_fns[shape]

    def embed_frames(self, frames: np.ndarray,
                     device_out: bool = False) -> np.ndarray:
        """uint8 [N, H, W, 3] → unit-norm float32 [N, D].

        Pads to a data-axis-divisible bucket, runs chunks of at most
        ``EMBED_BATCH_PER_DEVICE × n_data`` frames, strips padding.
        """
        n = len(frames)
        if n == 0:
            return np.zeros((0, self.cfg.projection_dim), np.float32)
        chunk_cap = settings.EMBED_BATCH_PER_DEVICE * self.mesh.n_data
        outs: List[np.ndarray] = []
        for lo in range(0, n, chunk_cap):
            part = self._pack_transfer(frames[lo: lo + chunk_cap])
            bucket = self.mesh.pad_to_data(
                pick_bucket(len(part), settings.FRAME_BUCKETS))
            padded = np.zeros((bucket,) + part.shape[1:], np.uint8)
            padded[: len(part)] = part
            sharded = jax.device_put(jnp.asarray(padded),
                                     self.mesh.data_sharded)
            emb = self._image_fn(part.shape[1:])(self.params, sharded)
            outs.append(np.asarray(emb[: len(part)], np.float32))
        result = np.concatenate(outs, axis=0)
        return result

    def embed_stream(self, chunks) -> np.ndarray:
        """Overlapped decode→embed: consume an iterator of uint8
        ``[c, H, W, 3]`` chunks (``VideoReader.stream_frames``), staging
        pad + host→device transfer on a prefetch thread
        (``parallel/prefetch.py``) while the device embeds the previous
        chunk (dispatch is async; only the final materialization
        blocks). Fixed chunk size → at most two compiled shapes."""
        from .prefetch import prefetch_to_device

        lens: List[int] = []

        def pad(part: np.ndarray) -> jnp.ndarray:
            # compact-transfer pack runs HERE, on the prefetch thread:
            # the resize/YUV host work overlaps device compute and the
            # H2D copy ships size²·1.5 bytes/frame instead of raw
            # frames (the cold-scan wall on bandwidth-limited links)
            part = self._pack_transfer(part)
            bucket = self.mesh.pad_to_data(
                pick_bucket(len(part), settings.FRAME_BUCKETS))
            padded = np.zeros((bucket,) + part.shape[1:], np.uint8)
            padded[: len(part)] = part
            lens.append(len(part))
            return jnp.asarray(padded)

        outs: List[jax.Array] = []
        for dev_chunk in prefetch_to_device(chunks, buffer_size=2,
                                            sharding=self.mesh.data_sharded,
                                            transform=pad):
            outs.append(self._image_fn(dev_chunk.shape[1:])(
                self.params, dev_chunk))
        if not outs:
            return np.zeros((0, self.cfg.projection_dim), np.float32)
        return np.concatenate([np.asarray(e[:n], np.float32)
                               for e, n in zip(outs, lens)], axis=0)

    def embed_frames_device(self, frames: np.ndarray) -> jax.Array:
        """Like ``embed_frames`` but keeps the (padded) result on device;
        returns (embeddings [B, D], valid mask [B])."""
        frames = self._pack_transfer(frames)
        bucket = self.mesh.pad_to_data(
            pick_bucket(len(frames), settings.FRAME_BUCKETS))
        padded = np.zeros((bucket,) + frames.shape[1:], np.uint8)
        padded[: len(frames)] = frames
        sharded = jax.device_put(jnp.asarray(padded), self.mesh.data_sharded)
        emb = self._image_fn(frames.shape[1:])(self.params, sharded)
        valid = jnp.arange(bucket) < len(frames)
        return emb, valid

    # ------------------------------------------------------------------
    def embed_texts(self, texts: Sequence[str] | str) -> np.ndarray:
        """→ unit-norm float32 [Q, D]. Per-text LRU cache: repeated
        serving queries skip tokenize + text tower."""
        if isinstance(texts, str):
            texts = [texts]
        texts = list(texts)
        if not texts:
            return np.zeros((0, self.cfg.projection_dim), np.float32)
        cap = settings.TEXT_EMBED_CACHE
        with self._lock:
            hits = {}
            for t in texts:
                if t in self._text_cache:
                    hits[t] = self._text_cache[t]
                    self._text_cache.move_to_end(t)
        misses = [t for t in texts if t not in hits]
        if misses:
            ids = self.tokenizer(misses)
            if self._text_fn is None:
                model = self.model

                @jax.jit
                def run(params, ids):
                    return model.apply({"params": params}, ids,
                                       method=model.encode_text)

                self._text_fn = run
            fresh = np.asarray(self._text_fn(self.params,
                                             jnp.asarray(ids)), np.float32)
            with self._lock:
                for t, e in zip(misses, fresh):
                    hits[t] = e
                    if cap > 0:
                        self._text_cache[t] = e
                        self._text_cache.move_to_end(t)
                        while len(self._text_cache) > cap:
                            self._text_cache.popitem(last=False)
        return np.stack([hits[t] for t in texts])

    def resident_table(self, emb: np.ndarray, middle_idx: np.ndarray
                       ) -> "tuple[jax.Array, jax.Array, jax.Array]":
        """Bucket-padded device copies of a score table + window
        indices, cached by host-array identity (LRU of 8): repeat
        queries against the same cached embedding table must not
        re-upload ~1 MB per call. Identity is a sound key because the
        embedding cache returns the same array object for repeat
        lookups and tables are never mutated in place."""
        from ..ops.similarity import pad_table

        mids = np.asarray(middle_idx, np.int32)
        with self._lock:
            for key, (href, hmids, cached) in self._table_lru.items():
                if href is emb and np.array_equal(hmids, mids):
                    self._table_lru.move_to_end(key)
                    return cached
        pemb, valid, pmids = pad_table(np.asarray(emb, np.float32),
                                       mids, settings.FRAME_BUCKETS)
        dev = (jnp.asarray(pemb), jnp.asarray(valid),
               jnp.asarray(pmids))
        with self._lock:
            self._table_seq = getattr(self, "_table_seq", 0) + 1
            self._table_lru[self._table_seq] = (emb, mids, dev)
            while len(self._table_lru) > 8:
                self._table_lru.popitem(last=False)
        return dev

    def query_window_topk(self, query: str, emb: np.ndarray,
                          middle_idx: np.ndarray, k: int
                          ) -> "tuple[np.ndarray, np.ndarray]":
        """Warm-query serving path in ONE dispatch: token ids → text
        tower → score the whole table → window gather → top-k. The
        unfused path (``embed_texts`` then ``window_topk``) pays two
        host↔device round-trips; through the tunneled chip that is a
        third of the measured warm-query p50. The table pads to
        ``FRAME_BUCKETS`` so arbitrary video lengths reuse a handful of
        compiled programs. The text embedding rides back in the same
        dispatch to keep the per-text LRU cache warm for every other
        consumer (phase-2 caption similarity, grounding)."""
        dev = self.resident_table(emb, middle_idx)
        fn = self._query_topk_fn
        if fn is None:
            with self._lock:
                fn = self._query_topk_fn
                if fn is None:
                    from ..ops.similarity import make_query_window_topk

                    fn = make_query_window_topk(self.model)
                    self._query_topk_fn = fn
        ids = self.tokenizer([query])
        vals, idx, q = fn(self.params, jnp.asarray(ids),
                          dev[0], dev[1], dev[2], k)
        vals, idx = np.asarray(vals), np.asarray(idx)
        q = np.asarray(q, np.float32)
        cap = settings.TEXT_EMBED_CACHE
        if cap > 0:
            with self._lock:
                self._text_cache[query] = q
                self._text_cache.move_to_end(query)
                while len(self._text_cache) > cap:
                    self._text_cache.popitem(last=False)
        return vals, idx

    def embed_images(self, images: Sequence[np.ndarray]) -> np.ndarray:
        """Convenience for reference images / crops of heterogeneous
        sizes: each is preprocessed independently (host-side resize to
        the model square), then batched through one jitted encoder
        call. Under concurrent API load the calls coalesce through a
        ``BatchingExecutor`` (``parallel/scheduler.py``) so many small
        crop batches share one MXU dispatch."""
        if len(images) == 0:
            return np.zeros((0, self.cfg.projection_dim), np.float32)
        size = self.cfg.image_size
        batch = np.stack([
            np.asarray(clip_preprocess(
                np.ascontiguousarray(img)[None].astype(np.uint8),
                size=size))[0]
            for img in images])
        if settings.BATCHING_EXECUTOR_ENABLED:
            return self._pixel_batcher()(batch)
        return self.embed_pixels(batch)

    def embed_pixels(self, batch: np.ndarray) -> np.ndarray:
        """Preprocessed float [N, S, S, 3] → unit-norm [N, D] (padded
        to a bucket; the batched-fn target of the BatchingExecutor)."""
        n = len(batch)
        if n == 0:
            return np.zeros((0, self.cfg.projection_dim), np.float32)
        size = self.cfg.image_size
        bucket = 1 if n == 1 else pick_bucket(n, [4, 16, 64, 256])
        padded = np.zeros((bucket, size, size, 3), np.float32)
        padded[:n] = batch
        if self._px_fn is None:
            with self._lock:
                if self._px_fn is None:
                    model = self.model

                    @jax.jit
                    def run(params, px):
                        return model.apply({"params": params}, px,
                                           method=model.encode_image)

                    self._px_fn = run
        out = self._px_fn(self.params, jnp.asarray(padded))
        return np.asarray(out[:n], np.float32)

    def _pixel_batcher(self):
        """Lazily-built request coalescer over ``embed_pixels``."""
        if self._batcher is None:
            with self._lock:
                if self._batcher is None:
                    from .scheduler import BatchingExecutor

                    self._batcher = BatchingExecutor(
                        self.embed_pixels,
                        max_batch=settings.EMBED_BATCH_PER_DEVICE
                        * self.mesh.n_data,
                        max_wait_ms=settings.BATCHING_MAX_WAIT_MS)
        return self._batcher


_DEFAULT: Optional[ClipEngine] = None


def get_engine() -> ClipEngine:
    """Process-wide engine (role of the reference's model cache +
    singleton ``VideoProcessor`` model ownership)."""
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = ClipEngine()
    return _DEFAULT


def set_engine(engine: Optional[ClipEngine]) -> None:
    global _DEFAULT
    _DEFAULT = engine
