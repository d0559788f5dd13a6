"""YOLOv8 detector in Flax — anchor-free, DFL head, fixed-shape decode.

Re-implements (not wraps) the detector behind the reference's
``ObjectDetector``/``YOLOv8Nano`` (``/root/reference/src/services/
object_detector.py:119-140``, ``small_object_detector.py:294-372``,
ultralytics YOLOv8n). Architecture: CSPDarknet backbone (C2f blocks +
SPPF) → PAN-FPN neck → decoupled anchor-free head with Distribution
Focal Loss box regression (reg_max=16), scaled by ``depth/width``
multiples (n/s/m/l/x).

TPU-first properties:
- whole-batch NHWC forward, BN folded at inference
  (``use_running_average``);
- decode (DFL softmax → ltrb → xyxy, sigmoid cls) happens on device in
  the same program, producing FIXED-SHAPE ``[B, A, 4]``/``[B, A, nc]``
  tensors feeding the padded NMS (``ops/nms.py``) — the reference's
  torchvision NMS is dynamic-shaped and host-bound;
- weight conversion from an ultralytics state_dict export
  (``convert_yolov8_state_dict``) maps layer indices one-to-one.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# COCO class names (output contract of the reference's YOLO path)
COCO_CLASSES = [
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella",
    "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard",
    "sports ball", "kite", "baseball bat", "baseball glove", "skateboard",
    "surfboard", "tennis racket", "bottle", "wine glass", "cup", "fork",
    "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair",
    "couch", "potted plant", "bed", "dining table", "toilet", "tv",
    "laptop", "mouse", "remote", "keyboard", "cell phone", "microwave",
    "oven", "toaster", "sink", "refrigerator", "book", "clock", "vase",
    "scissors", "teddy bear", "hair drier", "toothbrush",
]

SCALES = {
    # depth, width, max_channels
    "n": (0.34, 0.25, 1024),
    "s": (0.34, 0.50, 1024),
    "m": (0.67, 0.75, 768),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.25, 512),
}


@dataclasses.dataclass(frozen=True)
class YoloConfig:
    num_classes: int = 80
    scale: str = "n"
    reg_max: int = 16
    img_size: int = 640
    dtype: str = "float32"

    @property
    def depth(self) -> float:
        return SCALES[self.scale][0]

    @property
    def width(self) -> float:
        return SCALES[self.scale][1]

    @property
    def max_ch(self) -> int:
        return SCALES[self.scale][2]

    def ch(self, c: int) -> int:
        """Scaled channel count (ultralytics make_divisible by 8)."""
        return int(math.ceil(min(c, self.max_ch) * self.width / 8) * 8)

    def n(self, d: int) -> int:
        return max(round(d * self.depth), 1)

    @property
    def jnp_dtype(self) -> jnp.dtype:
        return jnp.dtype(self.dtype)


def yolov8n(num_classes: int = 80) -> YoloConfig:
    return YoloConfig(num_classes=num_classes, scale="n")


def tiny_yolo_config() -> YoloConfig:
    """Reduced input for fast CPU tests (architecture unchanged)."""
    return YoloConfig(num_classes=4, scale="n", img_size=64)


class ConvBN(nn.Module):
    out: int
    k: int = 1
    s: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.k // 2
        x = nn.Conv(self.out, (self.k, self.k), strides=(self.s, self.s),
                    padding=((p, p), (p, p)), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         momentum=0.97, dtype=self.dtype, name="bn")(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    out: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = ConvBN(self.out, 3, dtype=self.dtype, name="cv1")(x)
        y = ConvBN(self.out, 3, dtype=self.dtype, name="cv2")(y)
        return x + y if self.shortcut and x.shape[-1] == self.out else y


class C2f(nn.Module):
    out: int
    n: int = 1
    shortcut: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.out // 2
        y = ConvBN(2 * c, 1, dtype=self.dtype, name="cv1")(x)
        parts = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            parts.append(Bottleneck(c, self.shortcut, self.dtype,
                                    name=f"m_{i}")(parts[-1]))
        return ConvBN(self.out, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(parts, axis=-1))


class SPPF(nn.Module):
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1] // 2
        y = ConvBN(c, 1, dtype=self.dtype, name="cv1")(x)
        pool = lambda t: nn.max_pool(t, (5, 5), strides=(1, 1),
                                     padding=((2, 2), (2, 2)))
        p1 = pool(y)
        p2 = pool(p1)
        p3 = pool(p2)
        return ConvBN(self.out, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([y, p1, p2, p3], axis=-1))


def _upsample2(x: jax.Array) -> jax.Array:
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * 2, w * 2, c), method="nearest")


class YoloV8(nn.Module):
    """Returns per-level raw head outputs (box logits [B,H,W,4*reg_max],
    cls logits [B,H,W,nc]) at strides 8/16/32."""

    cfg: YoloConfig

    @nn.compact
    def __call__(self, x: jax.Array
                 ) -> List[Tuple[jax.Array, jax.Array]]:
        cfg = self.cfg
        dt = cfg.jnp_dtype
        ch = cfg.ch

        # backbone (ultralytics layer indices in names for conversion)
        x = ConvBN(ch(64), 3, 2, dt, name="b0")(x)              # P1
        x = ConvBN(ch(128), 3, 2, dt, name="b1")(x)             # P2
        x = C2f(ch(128), cfg.n(3), True, dt, name="b2")(x)
        x = ConvBN(ch(256), 3, 2, dt, name="b3")(x)             # P3
        p3 = C2f(ch(256), cfg.n(6), True, dt, name="b4")(x)
        x = ConvBN(ch(512), 3, 2, dt, name="b5")(p3)            # P4
        p4 = C2f(ch(512), cfg.n(6), True, dt, name="b6")(x)
        x = ConvBN(ch(1024), 3, 2, dt, name="b7")(p4)           # P5
        x = C2f(ch(1024), cfg.n(3), True, dt, name="b8")(x)
        p5 = SPPF(ch(1024), dt, name="b9")(x)

        # neck (PAN)
        u = jnp.concatenate([_upsample2(p5), p4], axis=-1)
        n4 = C2f(ch(512), cfg.n(3), False, dt, name="n12")(u)
        u = jnp.concatenate([_upsample2(n4), p3], axis=-1)
        n3 = C2f(ch(256), cfg.n(3), False, dt, name="n15")(u)   # out P3
        d = ConvBN(ch(256), 3, 2, dt, name="n16")(n3)
        n4b = C2f(ch(512), cfg.n(3), False, dt, name="n18")(
            jnp.concatenate([d, n4], axis=-1))                  # out P4
        d = ConvBN(ch(512), 3, 2, dt, name="n19")(n4b)
        n5 = C2f(ch(1024), cfg.n(3), False, dt, name="n21")(
            jnp.concatenate([d, p5], axis=-1))                  # out P5

        # decoupled head per level
        c2 = max(16, ch(256) // 4, 4 * cfg.reg_max)
        c3 = max(ch(256), min(cfg.num_classes, 100))
        outs = []
        for i, feat in enumerate((n3, n4b, n5)):
            b = ConvBN(c2, 3, dtype=dt, name=f"head_box_{i}_0")(feat)
            b = ConvBN(c2, 3, dtype=dt, name=f"head_box_{i}_1")(b)
            b = nn.Conv(4 * cfg.reg_max, (1, 1), dtype=dt,
                        name=f"head_box_{i}_2")(b)
            c = ConvBN(c3, 3, dtype=dt, name=f"head_cls_{i}_0")(feat)
            c = ConvBN(c3, 3, dtype=dt, name=f"head_cls_{i}_1")(c)
            c = nn.Conv(cfg.num_classes, (1, 1), dtype=dt,
                        name=f"head_cls_{i}_2")(c)
            outs.append((b.astype(jnp.float32), c.astype(jnp.float32)))
        return outs


def decode_predictions(outs: List[Tuple[jax.Array, jax.Array]],
                       cfg: YoloConfig,
                       strides: Sequence[int] = (8, 16, 32)
                       ) -> Tuple[jax.Array, jax.Array]:
    """Raw head outputs → (boxes [B, A, 4] xyxy px, cls probs [B, A, nc]).

    DFL: softmax over reg_max bins → expected ltrb distance per side,
    times stride, around anchor centers.
    """
    all_boxes, all_cls = [], []
    proj = jnp.arange(cfg.reg_max, dtype=jnp.float32)
    for (box, cls), stride in zip(outs, strides):
        b, h, w, _ = box.shape
        dist = box.reshape(b, h * w, 4, cfg.reg_max)
        dist = jax.nn.softmax(dist, axis=-1) @ proj      # [B, HW, 4]
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5)
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5)
        cx, cy = jnp.meshgrid(xs, ys)
        anchors = jnp.stack([cx.reshape(-1), cy.reshape(-1)], -1)  # [HW, 2]
        x0y0 = (anchors - dist[..., :2]) * stride
        x1y1 = (anchors + dist[..., 2:]) * stride
        all_boxes.append(jnp.concatenate([x0y0, x1y1], -1))
        all_cls.append(jax.nn.sigmoid(cls.reshape(b, h * w,
                                                  cfg.num_classes)))
    return (jnp.concatenate(all_boxes, axis=1),
            jnp.concatenate(all_cls, axis=1))


def init_yolo(cfg: Optional[YoloConfig] = None, seed: int = 0):
    cfg = cfg or yolov8n()
    model = YoloV8(cfg)
    rng = jax.random.PRNGKey(seed)
    x = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32)
    variables = model.init(rng, x)
    return model, variables


# ---------------------------------------------------------------------------
# conversion from an ultralytics state_dict export
# ---------------------------------------------------------------------------

_UL_BACKBONE = {0: "b0", 1: "b1", 2: "b2", 3: "b3", 4: "b4", 5: "b5",
                6: "b6", 7: "b7", 8: "b8", 9: "b9", 12: "n12", 15: "n15",
                16: "n16", 18: "n18", 19: "n19", 21: "n21"}


def convert_yolov8_state_dict(sd: Dict[str, np.ndarray], cfg: YoloConfig
                              ) -> Tuple[Dict, Dict]:
    """ultralytics ``model.state_dict()`` (keys ``model.<i>.*``) →
    (params, batch_stats) for ``YoloV8``.

    The ultralytics .pt pickle needs the ultralytics package to open;
    export the raw tensors first (``torch.save({k: v for k, v in
    model.model.state_dict().items()}, path)``). Validated by shape
    agreement; numerical parity requires ultralytics locally.
    """

    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, v):
        node = tree
        keys = path.split("/")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = np.asarray(v, np.float32)

    def conv_bn(src, dst):
        put(params, f"{dst}/conv/kernel",
            np.transpose(sd[f"{src}.conv.weight"], (2, 3, 1, 0)))
        put(params, f"{dst}/bn/scale", sd[f"{src}.bn.weight"])
        put(params, f"{dst}/bn/bias", sd[f"{src}.bn.bias"])
        put(stats, f"{dst}/bn/mean", sd[f"{src}.bn.running_mean"])
        put(stats, f"{dst}/bn/var", sd[f"{src}.bn.running_var"])

    def c2f(src, dst, n):
        conv_bn(f"{src}.cv1", f"{dst}/cv1")
        conv_bn(f"{src}.cv2", f"{dst}/cv2")
        for i in range(n):
            conv_bn(f"{src}.m.{i}.cv1", f"{dst}/m_{i}/cv1")
            conv_bn(f"{src}.m.{i}.cv2", f"{dst}/m_{i}/cv2")

    c2f_n = {2: cfg.n(3), 4: cfg.n(6), 6: cfg.n(6), 8: cfg.n(3),
             12: cfg.n(3), 15: cfg.n(3), 18: cfg.n(3), 21: cfg.n(3)}
    for idx, dst in _UL_BACKBONE.items():
        src = f"model.{idx}"
        if idx in c2f_n:
            c2f(src, dst, c2f_n[idx])
        elif idx == 9:
            conv_bn(f"{src}.cv1", f"{dst}/cv1")
            conv_bn(f"{src}.cv2", f"{dst}/cv2")
        else:
            conv_bn(src, dst)

    # head: model.22.cv2 (box) / cv3 (cls), 3 levels × (0,1 ConvBN + 2 Conv)
    for lvl in range(3):
        for j in (0, 1):
            conv_bn(f"model.22.cv2.{lvl}.{j}", f"head_box_{lvl}_{j}")
            conv_bn(f"model.22.cv3.{lvl}.{j}", f"head_cls_{lvl}_{j}")
        put(params, f"head_box_{lvl}_2/kernel",
            np.transpose(sd[f"model.22.cv2.{lvl}.2.weight"], (2, 3, 1, 0)))
        put(params, f"head_box_{lvl}_2/bias", sd[f"model.22.cv2.{lvl}.2.bias"])
        put(params, f"head_cls_{lvl}_2/kernel",
            np.transpose(sd[f"model.22.cv3.{lvl}.2.weight"], (2, 3, 1, 0)))
        put(params, f"head_cls_{lvl}_2/bias", sd[f"model.22.cv3.{lvl}.2.bias"])
    return params, stats
