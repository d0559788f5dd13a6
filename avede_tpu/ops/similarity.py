"""Cosine scoring + top-k over (sharded) embedding tables.

Replaces the reference's per-window numpy dot in a Python loop
(``/root/reference/src/pipeline/phase1_mvp.py:74-121``,
``openclip_model.py:212-214``) with one jitted matmul over the whole
frame-embedding table. Under a mesh, embeddings are sharded on the data
axis and ``lax.top_k`` runs after an implicit all-gather of the (tiny)
score vector — XLA inserts the collective from the sharding annotations.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-8) -> jax.Array:
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


@functools.partial(jax.jit, static_argnames=("normalize",))
def cosine_scores(frame_emb: jax.Array, query_emb: jax.Array,
                  normalize: bool = False) -> jax.Array:
    """``[N, D] × [Q, D] → [N, Q]`` cosine similarities (or ``[N]`` if Q
    is absent). Embeddings are expected unit-norm unless ``normalize``."""
    squeeze = query_emb.ndim == 1
    q = query_emb[None, :] if squeeze else query_emb
    f = frame_emb
    if normalize:
        f = l2_normalize(f)
        q = l2_normalize(q)
    s = jnp.dot(f, q.T, preferred_element_type=jnp.float32)
    return s[:, 0] if squeeze else s


@functools.partial(jax.jit, static_argnames=("k",))
def topk_scores(scores: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Top-k (values, indices) of a 1-D score vector; pads k to size."""
    k = min(k, scores.shape[0])
    return jax.lax.top_k(scores, k)


@functools.partial(jax.jit, static_argnames=("k",))
def masked_topk(scores: jax.Array, valid: jax.Array, k: int
                ) -> Tuple[jax.Array, jax.Array]:
    """Top-k ignoring padded entries (``valid`` is a bool mask). Padded
    rows score -inf so bucket padding never surfaces in results."""
    neg = jnp.full_like(scores, -jnp.inf)
    return topk_scores(jnp.where(valid, scores, neg), k)


@functools.partial(jax.jit, static_argnames=("k",))
def window_topk(frame_emb: jax.Array, valid: jax.Array, query_emb: jax.Array,
                middle_idx: jax.Array, k: int
                ) -> Tuple[jax.Array, jax.Array]:
    """Phase-1 core: score every frame, gather window middle frames,
    return top-k (scores, window indices). All fused into one XLA program.

    frame_emb:  [N, D] unit-norm (padded to bucket)
    valid:      [N] bool padding mask
    query_emb:  [D] unit-norm text embedding
    middle_idx: [W] int32 middle-frame index per window (padded with -1)
    """
    scores = jnp.dot(frame_emb, query_emb, preferred_element_type=jnp.float32)
    scores = jnp.where(valid, scores, -jnp.inf)
    w_valid = middle_idx >= 0
    w_scores = scores[jnp.maximum(middle_idx, 0)]
    w_scores = jnp.where(w_valid, w_scores, -jnp.inf)
    k = min(k, w_scores.shape[0])
    return jax.lax.top_k(w_scores, k)


@functools.partial(jax.jit, static_argnames=("k",))
def window_topk_multi(frame_emb: jax.Array, valid: jax.Array,
                      query_emb: jax.Array, middle_idx: jax.Array, k: int
                      ) -> Tuple[jax.Array, jax.Array]:
    """Multi-query phase-1 core: one ``[N, D] × [D, Q]`` matmul, window
    gather, per-query top-k — the whole multi-query scan is one XLA
    program (``lax.top_k`` batches over the leading query axis), so no
    host matmul sits on the serving path at scale.

    query_emb: [Q, D] unit-norm text embeddings
    returns:   ([Q, k] scores, [Q, k] window indices)
    """
    scores = jnp.dot(frame_emb, query_emb.T,
                     preferred_element_type=jnp.float32)      # [N, Q]
    scores = jnp.where(valid[:, None], scores, -jnp.inf)
    w_valid = middle_idx >= 0
    w_scores = scores[jnp.maximum(middle_idx, 0)]             # [W, Q]
    w_scores = jnp.where(w_valid[:, None], w_scores, -jnp.inf)
    k = min(k, w_scores.shape[0])
    return jax.lax.top_k(w_scores.T, k)


def pad_table(emb, middle_idx, buckets):
    """Pad a frame-embedding table and its window indices to bucket
    sizes so the scoring program compiles once per bucket pair, not
    once per distinct video length (serving sees arbitrary lengths;
    through a tunneled chip every fresh compile costs minutes).

    → (emb [Nb, D], valid [Nb] bool, middle_idx [Wb] int32 with -1
    padding). Host-side numpy; cheap relative to any dispatch.
    """
    import numpy as np

    def bucket(n):
        for b in buckets:
            if n <= b:
                return b
        return n

    n, d = emb.shape
    nb = bucket(n)
    out = np.zeros((nb, d), emb.dtype)
    out[:n] = emb
    valid = np.zeros((nb,), bool)
    valid[:n] = True
    w = len(middle_idx)
    wb = bucket(w)
    mids = np.full((wb,), -1, np.int32)
    mids[:w] = middle_idx
    return out, valid, mids


def make_query_window_topk(model):
    """Fused serving program: token ids → text tower → unit-norm query
    → score table → window gather → top-k, ONE dispatch (the unfused
    path pays a host round-trip to materialize the text embedding
    before a second round-trip for scoring; through the ~10 ms-RTT
    tunneled chip that is a third of the warm-query latency).

    Returns ``fn(params, ids [1, L], emb, valid, mids, k) →
    (vals [k], idx [k], text_emb [D])`` — the text embedding comes back
    too so the caller's per-text LRU cache stays warm.
    """

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(params, ids, frame_emb, valid, middle_idx, k):
        q = model.apply({"params": params}, ids,
                        method=model.encode_text)[0]
        scores = jnp.dot(frame_emb, q.astype(frame_emb.dtype),
                         preferred_element_type=jnp.float32)
        scores = jnp.where(valid, scores, -jnp.inf)
        w_valid = middle_idx >= 0
        w_scores = scores[jnp.maximum(middle_idx, 0)]
        w_scores = jnp.where(w_valid, w_scores, -jnp.inf)
        kk = min(k, w_scores.shape[0])
        vals, idx = jax.lax.top_k(w_scores, kk)
        return vals, idx, q.astype(jnp.float32)

    return run
