"""Pallas TPU kernels for the hot ops.

``fused_patch_embed`` — the BASELINE.json north-star fusion:

    uint8 → float → /255 → (x-mean)/std → 32×32 patchify → matmul(W)+b

The normalization affine and the 1/255 rescale are folded into the
patch-projection weights algebraically (``fold_for_uint8``), so the
NORMALIZED-float image tensor never exists anywhere. Division of labor
(measured, not aspirational): XLA performs the patchify relayout — the
[N, G·G, P·P·3] float view DOES round-trip HBM, because Mosaic cannot
lower the 5-D transposing reshape in-kernel and a C=3 lane layout makes
any in-kernel relayout VPU-hostile — and the Pallas kernel runs the
folded projection matmul. On v5e the plain XLA conv path still won
round 1 (4617 vs 4257 fps), so ``settings.USE_PALLAS`` defaults False;
``tools/pallas_sweep.py`` re-measures all variants on real hardware and
is the only thing that should flip that default.

Grid: one program per image. Weights ([P·P·3, D]) live in VMEM across
the whole grid (ViT-B/32: 3072×768 bf16 ≈ 4.5 MB).

All kernels run in interpret mode on CPU (tests) and compiled on TPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .preprocess import CLIP_MEAN, CLIP_STD


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform not in ("cpu", "gpu")
    except Exception:  # noqa: BLE001
        return False


def fold_for_uint8(kernel: jax.Array, mean: np.ndarray = CLIP_MEAN,
                   std: np.ndarray = CLIP_STD
                   ) -> Tuple[jax.Array, jax.Array]:
    """Fold /255 + normalize into flattened patch weights.

    kernel: [P, P, 3, D] → (W2 [P·P·3, D], bias_delta [D]) such that
    ``patchify(u8) @ W2 + bias_delta == conv(normalize(u8/255), kernel)``.
    """
    p, _, c, d = kernel.shape
    mean = jnp.asarray(mean, jnp.float32).reshape(1, 1, 3, 1)
    std = jnp.asarray(std, jnp.float32).reshape(1, 1, 3, 1)
    k2 = kernel / (255.0 * std)
    bias_delta = -jnp.sum(kernel * mean / std, axis=(0, 1, 2))
    return k2.reshape(p * p * c, d), bias_delta


def _patch_matmul_kernel(x_ref, w_ref, b_ref, out_ref):
    """One image's patches: [GG, K] @ [K, D] + b → [GG, D] (MXU)."""
    out_ref[0] = (jnp.dot(x_ref[0], w_ref[...],
                          preferred_element_type=jnp.float32)
                  + b_ref[...])


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_patch_embed(frames: jax.Array, kernel: jax.Array,
                      bias: jax.Array, interpret: bool = False
                      ) -> jax.Array:
    """[N, S, S, 3] frames (uint8 or 0..255 float) + conv kernel
    [P, P, 3, D] (+bias [D]) → [N, G·G, D] normalized patch embeddings.

    Split of labor: XLA performs the patchify relayout (it fuses the
    dtype cast + transpose into the surrounding program; Mosaic cannot
    lower the 5-D shape-cast in-kernel), while the Pallas kernel runs
    the folded projection matmul — the /255 rescale and the CLIP
    normalization live inside the weights (``fold_for_uint8``), so the
    normalized-float image tensor never hits HBM. ``bias`` is the
    model's conv bias (zeros for CLIP); the fold's bias delta is added
    internally.
    """
    n, s, _, _ = frames.shape
    p = kernel.shape[0]
    d = kernel.shape[-1]
    g = s // p
    k = p * p * 3
    w2, b_delta = fold_for_uint8(kernel)
    b2 = bias + b_delta

    x = frames.astype(jnp.float32).reshape(n, g, p, g, p, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, g * g, k)

    return pl.pallas_call(
        _patch_matmul_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, g * g, k), lambda i: (i, 0, 0)),
            pl.BlockSpec((k, d), lambda i: (0, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, g * g, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, g * g, d), jnp.float32),
        interpret=interpret,
    )(x, w2, b2)


def patch_embed_reference(frames_u8: jax.Array, kernel: jax.Array,
                          bias: jax.Array) -> jax.Array:
    """XLA reference path (explicit normalize + conv) for parity tests."""
    x = frames_u8.astype(jnp.float32) / 255.0
    x = (x - CLIP_MEAN) / CLIP_STD
    y = jax.lax.conv_general_dilated(
        x, kernel, (kernel.shape[0], kernel.shape[0]), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    n, gh, gw, d = y.shape
    return y.reshape(n, gh * gw, d)


# ---------------------------------------------------------------------------
# fused cosine top-k: scores + top-k in one kernel (phase-1 inner loop)
# ---------------------------------------------------------------------------

def _score_kernel(emb_ref, q_ref, out_ref):
    out_ref[...] = jnp.dot(emb_ref[...], q_ref[...],
                           preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret", "block"))
def cosine_scores_pallas(emb: jax.Array, query: jax.Array,
                         interpret: bool = False,
                         block: int = 256) -> jax.Array:
    """[N, D] × [D] → [N] via a blocked Pallas matvec (N multiple of
    block or padded by caller)."""
    n, d = emb.shape
    nb = max(n // block, 1)
    blk = n // nb
    return pl.pallas_call(
        _score_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((blk, d), lambda i: (i, 0)),
                  pl.BlockSpec((d,), lambda i: (0,))],
        out_specs=pl.BlockSpec((blk,), lambda i: (i,)),
        out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
        interpret=interpret,
    )(emb, query)
