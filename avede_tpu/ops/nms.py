"""Fixed-shape non-maximum suppression for TPU.

The reference relies on ``torchvision.ops.nms``
(``/root/reference/src/services/small_object_detector.py:501-528``,
``region_proposal_network.py:789``), which returns a dynamic number of
boxes — incompatible with XLA's static-shape compilation. TPU-native
formulation (SURVEY.md §7.3.3): all inputs/outputs are padded to
``max_out``; suppressed/empty slots carry score ``-inf`` and a validity
mask, and the whole loop is a ``lax.fori_loop`` of vectorized IoU
comparisons — O(N·N) on the VPU, no host sync.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou


@functools.partial(jax.jit,
                   static_argnames=("max_out", "presorted",
                                    "return_indices"))
def nms_padded(boxes: jax.Array, scores: jax.Array, iou_threshold: float,
               max_out: int, presorted: bool = False,
               return_indices: bool = False):
    """Greedy class-agnostic NMS.

    boxes  [N, 4] xyxy; scores [N] (-inf marks padding/invalid)
    → (boxes [max_out, 4], scores [max_out], valid [max_out] bool),
    score-sorted. With ``return_indices`` a fourth output gives each
    kept slot's index into the ORIGINAL input order (0 on invalid
    slots) so callers can gather per-box auxiliary data (e.g. the
    OWL-ViT per-patch best-query index) through the suppression.

    ``presorted=True`` skips the input sort — pass it when scores are
    already descending (e.g. straight out of ``lax.top_k``): a 400-wide
    argsort lowers to ~80 sequential bitonic micro-kernels on TPU and
    costs more than the whole suppression fixpoint.
    """
    n = boxes.shape[0]
    if presorted:
        boxes_s = boxes
        scores_s = scores
        order = jnp.arange(n)
    else:
        order = jnp.argsort(-scores)
        boxes_s = boxes[order]
        scores_s = scores[order]
    iou = pairwise_iou(boxes_s, boxes_s)

    alive0 = scores_s > -jnp.inf

    # Greedy NMS as a FIXPOINT, not an N-step sequential loop. The
    # greedy solution is the unique solution of the recurrence
    #   alive(j) = valid(j) & ¬∃ i<j : alive(i) & iou(i,j) > thr
    # (unique by induction on j), so iterating the whole recurrence as
    # one vectorized [N,N] step converges exactly to it — in
    # suppression-chain-depth iterations (typically ~3-8), not N. On
    # TPU this turns 400 latency-bound scalar-indexed steps into a
    # handful of VPU matrix steps (~6x faster whole-detector NMS stage,
    # tools/tune_scan.py). Convergence ≤ N+1 iterations is guaranteed:
    # alive(j) depends only on i<j, and stabilized prefixes never
    # change again.
    sup = (iou > iou_threshold) & jnp.triu(jnp.ones((n, n), bool), 1)

    def cond(state):
        _, changed, it = state
        return changed & (it <= n)

    def body(state):
        a, _, it = state
        suppressed = jnp.any(sup & a[:, None], axis=0)
        new = alive0 & ~suppressed
        return new, jnp.any(new != a), it + 1

    alive, _, _ = jax.lax.while_loop(
        cond, body, (alive0, jnp.asarray(True), jnp.asarray(0)))

    kept_scores = jnp.where(alive, scores_s, -jnp.inf)
    # compaction via top_k (k = max_out), not a full argsort: survivors
    # keep their relative (descending) order and dead slots sink as -inf
    out_scores, top = jax.lax.top_k(kept_scores, min(max_out, n))
    out_boxes = boxes_s[top]
    out_idx = order[top]
    if max_out > n:  # keep the padded output contract
        out_boxes = jnp.pad(out_boxes, ((0, max_out - n), (0, 0)))
        out_scores = jnp.pad(out_scores, (0, max_out - n),
                             constant_values=-jnp.inf)
        out_idx = jnp.pad(out_idx, (0, max_out - n))
    valid = out_scores > -jnp.inf
    if return_indices:
        return out_boxes, out_scores, valid, jnp.where(valid, out_idx, 0)
    return out_boxes, out_scores, valid


@functools.partial(jax.jit, static_argnames=("max_out", "presorted"))
def nms_per_class(boxes: jax.Array, scores: jax.Array, classes: jax.Array,
                  iou_threshold: float, max_out: int,
                  presorted: bool = False
                  ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-class NMS via the coordinate-offset trick: boxes of different
    classes are translated to disjoint regions so one class-agnostic
    pass suppresses only within-class overlaps."""
    span = jnp.max(boxes) + 1.0
    offset = classes.astype(jnp.float32)[:, None] * span
    shifted = boxes + offset
    ob, os, valid = nms_padded(shifted, scores, iou_threshold, max_out,
                               presorted=presorted)
    # recover class + original coordinates from the shift itself: with
    # 0 ≤ coord < span, floor(x0 / span) is exactly the class id
    cls_out = jnp.clip(jnp.floor(ob[:, 0] / span), 0, None
                       ).astype(classes.dtype)
    boxes_out = ob - cls_out.astype(jnp.float32)[:, None] * span
    return boxes_out, os, cls_out, valid
