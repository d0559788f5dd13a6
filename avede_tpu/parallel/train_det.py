"""YOLO detection training — simplified-TAL assignment, DFL + IoU + BCE.

The reference ships no training at all (SURVEY.md: inference-only
system; two of its three small-object models emit ``np.random`` boxes,
``small_object_detector.py:148-282``). This module makes the detection
capability *provable*: a real anchor-free detection loss over the Flax
YOLOv8 (``models/yolo.py``), used by ``eval.py --mode detection`` to
train on synthetic shapes and demonstrate ground-truth precision/recall
through the full device detect→NMS path.

Loss (YOLOv8-style, statically shaped for TPU):
- assignment: anchor positive ⟺ its center lies inside a ground-truth
  box; among multiple, the highest-IoU gt wins (a static-shape
  simplification of ultralytics' task-aligned assigner);
- classification: BCE on sigmoid logits, target = IoU-quality of the
  assigned gt (quality focal style) at the assigned class;
- box: Distribution Focal Loss on the two bins adjacent to the true
  ltrb distance + (1 − IoU) on the expected box.

Ground truth is padded to a fixed ``max_boxes`` per image
(``gt_mask`` marks real rows) — no dynamic shapes anywhere.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.yolo import YoloConfig, YoloV8, init_yolo
from ..ops.boxes import pairwise_iou
from .mesh import DATA_AXIS, MeshContext
from .train import TrainState

from jax.sharding import NamedSharding, PartitionSpec as P


def _level_anchors(cfg: YoloConfig, strides: Sequence[int] = (8, 16, 32)
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Anchor centers (px) and per-anchor stride for every head cell."""
    centers, strs = [], []
    for s in strides:
        g = cfg.img_size // s
        ys, xs = jnp.meshgrid(jnp.arange(g, dtype=jnp.float32) + 0.5,
                              jnp.arange(g, dtype=jnp.float32) + 0.5,
                              indexing="ij")
        centers.append(jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1) * s)
        strs.append(jnp.full((g * g,), float(s)))
    return jnp.concatenate(centers), jnp.concatenate(strs)


def yolo_detection_loss(outs, cfg: YoloConfig, gt_boxes: jax.Array,
                        gt_labels: jax.Array, gt_mask: jax.Array
                        ) -> Tuple[jax.Array, dict]:
    """outs: per-level raw head outputs from ``YoloV8.__call__``.

    gt_boxes [B, M, 4] xyxy px · gt_labels [B, M] int · gt_mask [B, M].
    """
    anchors, strides = _level_anchors(cfg)             # [A,2], [A]
    box_logits = jnp.concatenate(
        [b.reshape(b.shape[0], -1, 4 * cfg.reg_max) for b, _ in outs], 1)
    cls_logits = jnp.concatenate(
        [c.reshape(c.shape[0], -1, cfg.num_classes) for _, c in outs], 1)
    B, A = cls_logits.shape[:2]
    proj = jnp.arange(cfg.reg_max, dtype=jnp.float32)

    dist = box_logits.reshape(B, A, 4, cfg.reg_max)
    exp_ltrb = jax.nn.softmax(dist, -1) @ proj          # [B, A, 4]
    px0y0 = anchors[None] - exp_ltrb[..., :2] * strides[None, :, None]
    px1y1 = anchors[None] + exp_ltrb[..., 2:] * strides[None, :, None]
    pred_boxes = jnp.concatenate([px0y0, px1y1], -1)    # [B, A, 4] px

    def per_image(pb, cl, dl, gb, gl, gm):
        # inside test: [A, M]
        cx, cy = anchors[:, 0:1], anchors[:, 1:2]
        inside = ((cx > gb[None, :, 0]) & (cx < gb[None, :, 2])
                  & (cy > gb[None, :, 1]) & (cy < gb[None, :, 3])
                  & gm[None, :])
        iou = pairwise_iou(pb, gb) * inside             # [A, M]
        best_gt = jnp.argmax(iou, -1)                   # [A]
        pos = jnp.any(inside, -1)
        quality = jnp.max(iou, -1)                      # [A]

        tgt_box = gb[best_gt]                           # [A, 4]
        tgt_cls = gl[best_gt]                           # [A]

        # classification: quality-focal BCE (target = IoU at the
        # assigned class for positives, 0 elsewhere)
        onehot = jax.nn.one_hot(tgt_cls, cfg.num_classes)
        cls_tgt = onehot * (quality * pos)[:, None]
        cls_loss = optax.sigmoid_binary_cross_entropy(cl, cls_tgt).sum(-1)
        cls_loss = cls_loss.mean()

        # box losses on positives only
        t_ltrb = jnp.stack([
            (anchors[:, 0] - tgt_box[:, 0]),
            (anchors[:, 1] - tgt_box[:, 1]),
            (tgt_box[:, 2] - anchors[:, 0]),
            (tgt_box[:, 3] - anchors[:, 1]),
        ], -1) / strides[:, None]
        t_ltrb = jnp.clip(t_ltrb, 0.0, cfg.reg_max - 1.01)
        lo = jnp.floor(t_ltrb)
        w_hi = t_ltrb - lo
        logp = jax.nn.log_softmax(dl.reshape(A, 4, cfg.reg_max), -1)
        lo_i = lo.astype(jnp.int32)
        dfl = -(jnp.take_along_axis(logp, lo_i[..., None], -1)[..., 0]
                * (1 - w_hi)
                + jnp.take_along_axis(logp, (lo_i + 1)[..., None],
                                      -1)[..., 0] * w_hi)
        npos = jnp.maximum(pos.sum(), 1.0)
        dfl_loss = (dfl.mean(-1) * pos).sum() / npos
        iou_pred = jnp.take_along_axis(
            iou, best_gt[:, None], -1)[:, 0]
        iou_loss = ((1.0 - iou_pred) * pos).sum() / npos
        return cls_loss, dfl_loss, iou_loss

    cls_l, dfl_l, iou_l = jax.vmap(per_image)(
        pred_boxes, cls_logits, box_logits, gt_boxes,
        gt_labels, gt_mask)
    loss = cls_l.mean() + 0.4 * dfl_l.mean() + 2.0 * iou_l.mean()
    return loss, {"cls": cls_l.mean(), "dfl": dfl_l.mean(),
                  "iou": iou_l.mean()}


def create_yolo_train_state(cfg: Optional[YoloConfig] = None,
                            learning_rate: float = 2e-3, seed: int = 0):
    model, variables = init_yolo(cfg, seed=seed)
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adam(learning_rate))
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx)
    return model, state, {k: v for k, v in variables.items()
                          if k != "params"}


def make_yolo_train_step(model: YoloV8, extra_vars: dict,
                         mesh: Optional[MeshContext] = None):
    """Jitted (optionally SPMD over ``data``) detection train step."""
    cfg = model.cfg

    def step(state: TrainState, images, gt_boxes, gt_labels, gt_mask):
        def loss_fn(params):
            outs = model.apply({"params": params, **extra_vars},
                               images.astype(jnp.float32) / 255.0)
            return yolo_detection_loss(outs, cfg, gt_boxes, gt_labels,
                                       gt_mask)

        (loss, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads), {"loss": loss, **parts}

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    data = NamedSharding(mesh.mesh, P(DATA_AXIS))
    return jax.jit(step, in_shardings=(None, data, data, data, data),
                   donate_argnums=(0,))
