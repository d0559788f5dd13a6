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


@functools.partial(jax.jit, static_argnames=("max_out",))
def nms_padded(boxes: jax.Array, scores: jax.Array, iou_threshold: float,
               max_out: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Greedy class-agnostic NMS.

    boxes  [N, 4] xyxy; scores [N] (-inf marks padding/invalid)
    → (boxes [max_out, 4], scores [max_out], valid [max_out] bool),
    score-sorted.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    scores_s = scores[order]
    iou = pairwise_iou(boxes_s, boxes_s)

    alive0 = scores_s > -jnp.inf

    def body(i, alive):
        # if box i is still alive, kill every lower-scored box that
        # overlaps it beyond the threshold
        kill = (iou[i] > iou_threshold) & (jnp.arange(n) > i) & alive[i]
        return alive & ~kill

    alive = jax.lax.fori_loop(0, n, body, alive0)

    kept_scores = jnp.where(alive, scores_s, -jnp.inf)
    top = jnp.argsort(-kept_scores)[:max_out]
    out_boxes = boxes_s[top]
    out_scores = kept_scores[top]
    valid = out_scores > -jnp.inf
    return out_boxes, out_scores, valid


@functools.partial(jax.jit, static_argnames=("max_out",))
def nms_per_class(boxes: jax.Array, scores: jax.Array, classes: jax.Array,
                  iou_threshold: float, max_out: int
                  ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-class NMS via the coordinate-offset trick: boxes of different
    classes are translated to disjoint regions so one class-agnostic
    pass suppresses only within-class overlaps."""
    span = jnp.max(boxes) + 1.0
    offset = classes.astype(jnp.float32)[:, None] * span
    shifted = boxes + offset
    ob, os, valid = nms_padded(shifted, scores, iou_threshold, max_out)
    # recover class + original coordinates from the shift itself: with
    # 0 ≤ coord < span, floor(x0 / span) is exactly the class id
    cls_out = jnp.clip(jnp.floor(ob[:, 0] / span), 0, None
                       ).astype(classes.dtype)
    boxes_out = ob - cls_out.astype(jnp.float32)[:, None] * span
    return boxes_out, os, cls_out, valid
