"""Int8 weight quantization for serving.

Pallas-guide quantization patterns applied to the framework's Dense
weights: per-output-channel symmetric int8 with f32 scales. Weight-only
quantization halves→quarters weight HBM traffic (the win at small
serving batches where weight reads dominate); activations stay in
bf16/f32.

- ``quantize_per_channel`` / ``dequantize`` — numpy/jnp reference
  implementations;
- ``quantize_kernel_pallas`` — on-device quantization (abs-max scale +
  round) as a Pallas kernel, interpret-tested on CPU;
- ``quantized_matmul`` — x @ (w_int8 · scale) computed as
  ``(x @ w_int8) · scale`` so the MXU runs the int8 matmul and the
  scale folds into the epilogue;
- ``quantize_dense_tree`` — walk a param tree, quantize every 2-D
  kernel, returning (int8 tree, scales tree) + a size report.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def quantize_per_channel(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[K, N] f32 → (int8 [K, N], scale f32 [N]) — symmetric, per
    output channel."""
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize(q: jax.Array, scale: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * scale


def quantize_rows_np(rows: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """[N, D] float → (int8 [N, D], f32 scales [N]) — per-ROW symmetric,
    the numpy twin of :func:`quantize_per_channel` (same amax/127
    scheme, 1e-12 floor) for host-side callers that must not dispatch a
    device program (the library index quantizes add-blocks under its
    lock; a tunnel round-trip per add would serialize serving)."""
    amax = np.max(np.abs(rows), axis=1)
    scales = np.maximum(amax / 127.0, 1e-12).astype(np.float32)
    q = np.clip(np.round(rows / scales[:, None]), -127, 127
                ).astype(np.int8)
    return q, scales


def _quant_kernel(w_ref, q_ref, s_ref):
    w = w_ref[...]
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q_ref[...] = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    s_ref[...] = scale.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def quantize_kernel_pallas(w: jax.Array, interpret: bool = False
                           ) -> Tuple[jax.Array, jax.Array]:
    """On-device per-channel quantization as one Pallas kernel."""
    k, n = w.shape
    return pl.pallas_call(
        _quant_kernel,
        out_shape=(jax.ShapeDtypeStruct((k, n), jnp.int8),
                   jax.ShapeDtypeStruct((n,), jnp.float32)),
        interpret=interpret,
    )(w)


@jax.jit
def quantized_matmul(x: jax.Array, q: jax.Array,
                     scale: jax.Array) -> jax.Array:
    """x [B, K] f32/bf16 × (q [K, N] int8, scale [N]) → [B, N] f32.

    The int8 operand rides the MXU via ``preferred_element_type``; the
    per-channel scale applies in the epilogue (XLA fuses it)."""
    y = jnp.dot(x.astype(jnp.float32), q.astype(jnp.float32),
                preferred_element_type=jnp.float32)
    return y * scale


def quantize_dense_tree(params: Mapping[str, Any]
                        ) -> Tuple[Dict[str, Any], Dict[str, Any], Dict]:
    """Quantize every 2-D ``kernel`` leaf; → (q_tree, scale_tree,
    report). Non-kernel leaves pass through unchanged in q_tree."""
    orig_bytes = 0
    quant_bytes = 0
    count = 0

    def walk(node):
        nonlocal orig_bytes, quant_bytes, count
        if isinstance(node, Mapping):
            q_out, s_out = {}, {}
            for k, v in node.items():
                q, s = walk(v)
                q_out[k] = q
                if s is not None:
                    s_out[k] = s
            return q_out, (s_out or None)
        arr = np.asarray(node)
        if arr.ndim == 2 and arr.dtype in (np.float32, np.float64):
            q, s = quantize_per_channel(jnp.asarray(arr, jnp.float32))
            orig_bytes += arr.size * 4
            quant_bytes += arr.size + s.size * 4
            count += 1
            return np.asarray(q), np.asarray(s)
        orig_bytes += arr.nbytes
        quant_bytes += arr.nbytes
        return arr, None

    q_tree, s_tree = walk(dict(params))
    return q_tree, (s_tree or {}), {
        "kernels_quantized": count,
        "orig_mb": round(orig_bytes / 2 ** 20, 2),
        "quant_mb": round(quant_bytes / 2 ** 20, 2),
        "ratio": round(quant_bytes / max(orig_bytes, 1), 3),
    }
