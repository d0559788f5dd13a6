"""EfficientNet-B0 feature extractor (Flax).

Role model: the reference's timm EfficientNet-B0 used for 1280-d
background-independent object re-ID features
(``/root/reference/src/services/object_detector.py:171-196``). Full
MBConv architecture with squeeze-excitation; the classifier head is
omitted — this is a feature extractor by contract (the reference also
uses ``num_classes=0``).

The detection services default to CLIP crop embeddings for re-ID (one
resident backbone); this model is the drop-in when EfficientNet
features specifically are wanted (``settings.FEATURE_EXTRACTOR_WEIGHTS``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# (expand_ratio, kernel, stride, out_channels, repeats) — B0 table
B0_STAGES: List[Tuple[int, int, int, int, int]] = [
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
]


@dataclasses.dataclass(frozen=True)
class EffNetConfig:
    width_mult: float = 1.0
    depth_mult: float = 1.0
    feature_dim: int = 1280
    se_ratio: float = 0.25
    bn_eps: float = 1e-3
    dtype: str = "float32"

    def ch(self, c: int) -> int:
        c = c * self.width_mult
        new = max(8, int(c + 4) // 8 * 8)
        if new < 0.9 * c:
            new += 8
        return new

    def reps(self, r: int) -> int:
        return int(math.ceil(r * self.depth_mult))

    @property
    def jnp_dtype(self) -> jnp.dtype:
        return jnp.dtype(self.dtype)


def effnet_b0() -> EffNetConfig:
    return EffNetConfig()


def tiny_effnet_config() -> EffNetConfig:
    return EffNetConfig(width_mult=0.25, depth_mult=0.34, feature_dim=64)


class ConvBNAct(nn.Module):
    out: int
    k: int = 1
    s: int = 1
    groups: int = 1
    act: bool = True
    eps: float = 1e-3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.k // 2
        # TF-SAME semantics: stride-2 convs pad asymmetrically (one less
        # on top/left) — the canonical EfficientNet behavior, and what
        # HF/timm checkpoints were trained with.
        pad = ((p - 1, p), (p - 1, p)) if self.s == 2 else ((p, p), (p, p))
        x = nn.Conv(self.out, (self.k, self.k), strides=(self.s, self.s),
                    padding=pad,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=self.eps,
                         dtype=self.dtype, name="bn")(x)
        return nn.silu(x) if self.act else x


class SqueezeExcite(nn.Module):
    reduced: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype,
                    name="reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                    name="expand")(s)
        return x * jax.nn.sigmoid(s)


class MBConv(nn.Module):
    cfg: EffNetConfig
    out: int
    expand: int
    k: int
    s: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        dt = cfg.jnp_dtype
        inp = x.shape[-1]
        h = x
        mid = inp * self.expand
        if self.expand != 1:
            h = ConvBNAct(mid, 1, eps=cfg.bn_eps, dtype=dt,
                          name="expand_conv")(h)
        h = ConvBNAct(mid, self.k, self.s, groups=mid, eps=cfg.bn_eps,
                      dtype=dt, name="dw_conv")(h)
        h = SqueezeExcite(max(1, int(inp * cfg.se_ratio)), dt,
                          name="se")(h)
        h = ConvBNAct(self.out, 1, act=False, eps=cfg.bn_eps, dtype=dt,
                      name="project_conv")(h)
        if self.s == 1 and inp == self.out:
            h = x + h
        return h


class EfficientNet(nn.Module):
    """ImageNet-normalized pixels [N, S, S, 3] → features [N, D]."""

    cfg: EffNetConfig

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        cfg = self.cfg
        dt = cfg.jnp_dtype
        x = ConvBNAct(cfg.ch(32), 3, 2, eps=cfg.bn_eps, dtype=dt,
                      name="stem")(pixels.astype(dt))
        for si, (e, k, s, c, r) in enumerate(B0_STAGES):
            for ri in range(cfg.reps(r)):
                x = MBConv(cfg, cfg.ch(c), e, k, s if ri == 0 else 1,
                           name=f"s{si}_b{ri}")(x)
        x = ConvBNAct(cfg.feature_dim, 1, eps=cfg.bn_eps, dtype=dt,
                      name="head")(x)
        feats = x.mean(axis=(1, 2))
        return (feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True)
                         + 1e-9)).astype(jnp.float32)


def convert_effnet_state_dict(sd, cfg: Optional[EffNetConfig] = None):
    """HF ``EfficientNetModel`` state dict → Flax variables.

    The reference loads timm's pretrained EfficientNet-B0 for its
    1280-d re-ID features (``object_detector.py:171-196``); this
    converter accepts the equivalent public HF checkpoint
    (``google/efficientnet-b0``). Returns ``{"params", "batch_stats"}``.
    """
    from .convert import _np, _set

    cfg = cfg or effnet_b0()
    params: dict = {}
    stats: dict = {}

    def conv_bn(dst: str, conv_key: str, bn_key: str) -> None:
        # (2,3,1,0) also maps torch depthwise [C,1,k,k] → flax (k,k,1,C)
        w = _np(sd[f"{conv_key}.weight"]).transpose(2, 3, 1, 0)
        _set(params, f"{dst}/conv/kernel", w)
        _set(params, f"{dst}/bn/scale", _np(sd[f"{bn_key}.weight"]))
        _set(params, f"{dst}/bn/bias", _np(sd[f"{bn_key}.bias"]))
        _set(stats, f"{dst}/bn/mean", _np(sd[f"{bn_key}.running_mean"]))
        _set(stats, f"{dst}/bn/var", _np(sd[f"{bn_key}.running_var"]))

    conv_bn("stem", "embeddings.convolution", "embeddings.batchnorm")
    b = 0
    for si, (e, _k, _s, _c, r) in enumerate(B0_STAGES):
        for ri in range(cfg.reps(r)):
            s = f"encoder.blocks.{b}"
            d = f"s{si}_b{ri}"
            if e != 1:
                conv_bn(f"{d}/expand_conv", f"{s}.expansion.expand_conv",
                        f"{s}.expansion.expand_bn")
            conv_bn(f"{d}/dw_conv",
                    f"{s}.depthwise_conv.depthwise_conv",
                    f"{s}.depthwise_conv.depthwise_norm")
            for proj in ("reduce", "expand"):
                _set(params, f"{d}/se/{proj}/kernel",
                     _np(sd[f"{s}.squeeze_excite.{proj}.weight"]
                         ).transpose(2, 3, 1, 0))
                _set(params, f"{d}/se/{proj}/bias",
                     _np(sd[f"{s}.squeeze_excite.{proj}.bias"]))
            conv_bn(f"{d}/project_conv", f"{s}.projection.project_conv",
                    f"{s}.projection.project_bn")
            b += 1
    conv_bn("head", "encoder.top_conv", "encoder.top_bn")
    return {"params": params, "batch_stats": stats}


def init_effnet(cfg: Optional[EffNetConfig] = None, seed: int = 0,
                image_size: int = 224):
    cfg = cfg or effnet_b0()
    model = EfficientNet(cfg)
    rng = jax.random.PRNGKey(seed)
    x = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    variables = model.init(rng, x)
    return model, variables
