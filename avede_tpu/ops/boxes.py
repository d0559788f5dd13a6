"""Box utilities (device-side, fixed shapes).

Equivalents of the scattered box math in the reference
(IoU merges in ``universal_detector.py:913-971``,
``enhanced_person_detector.py:685-713``, torchvision NMS calls in
``small_object_detector.py:501-528``) — expressed as batched jnp ops.
Boxes are ``[N, 4]`` xyxy float32 unless noted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_area(boxes: jax.Array) -> jax.Array:
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def pairwise_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """[N, 4] × [M, 4] → [N, M] IoU."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def cxcywh_to_xyxy(boxes: jax.Array) -> jax.Array:
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy_to_cxcywh(boxes: jax.Array) -> jax.Array:
    x0, y0, x1, y1 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1)


def clip_boxes(boxes: jax.Array, w: float, h: float) -> jax.Array:
    return jnp.stack([
        jnp.clip(boxes[..., 0], 0.0, w),
        jnp.clip(boxes[..., 1], 0.0, h),
        jnp.clip(boxes[..., 2], 0.0, w),
        jnp.clip(boxes[..., 3], 0.0, h),
    ], axis=-1)
