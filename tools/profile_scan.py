"""Decompose the phase-1 scan into stage timings on real hardware.

The headline bench (`bench.py`) measures the full fused program; this
tool answers *where the time goes* so optimization effort lands on the
actual wall: it times, separately jitted,

  stage        program
  -----        -------
  preprocess   crop + /255 + bicubic resize + normalize
  vit          ViT-B/32 forward on preprocessed pixels (bf16)
  vit_matmuls  the 12-layer tower only (no patch conv / final norm)
  full         preprocess -> ViT -> cosine (what bench.py runs)
  noop         device round-trip on a 1-element array (dispatch floor)

and prints per-stage ms plus a rough MXU-utilization estimate for the
ViT stage (8.7 GFLOPs/frame forward at 224px/patch32).

Usage (on TPU):  python tools/profile_scan.py [--batch 256]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

VIT_B32_GFLOPS = 8.7  # fwd FLOPs per 224x224 frame, patch 32


def _time(fn, *args, reps: int = 6) -> float:
    for _ in range(2):
        np.asarray(jax_block(fn(*args)))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(jax_block(out))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def jax_block(x):
    import jax

    return jax.block_until_ready(x)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--peak-tflops", type=float, default=197.0,
                   help="bf16 peak of the chip (v5e: 197)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from avede_tpu.models.clip import init_clip, vit_b32
    from avede_tpu.ops.preprocess import clip_preprocess

    cfg = dataclasses.replace(vit_b32(), dtype="bfloat16")
    model, params = init_clip(cfg, seed=0)
    b = args.batch
    frames = jax.device_put(jnp.asarray(np.random.default_rng(0).integers(
        0, 255, size=(b, 288, 512, 3), dtype=np.uint8)))
    query = jax.device_put(jnp.asarray(np.random.default_rng(1).normal(
        size=(cfg.projection_dim,)).astype(np.float32)))

    pre = jax.jit(lambda f: clip_preprocess(f, size=cfg.image_size))
    vit = jax.jit(lambda p_, px: model.apply(
        {"params": p_}, px, method=model.encode_image))

    @jax.jit
    def full(p_, f, q):
        px = clip_preprocess(f, size=cfg.image_size)
        emb = model.apply({"params": p_}, px, method=model.encode_image)
        return jnp.dot(emb, q, preferred_element_type=jnp.float32)

    noop = jax.jit(lambda x: x + 1.0)

    px = jax_block(pre(frames))
    t_noop = _time(noop, jnp.zeros((1,), jnp.float32))
    t_pre = _time(pre, frames)
    t_vit = _time(vit, params, px)
    t_full = _time(full, params, frames, query)

    vit_tflops = b * VIT_B32_GFLOPS / t_vit / 1000.0
    print(json.dumps({
        "batch": b,
        "device": str(jax.devices()[0]),
        "noop_roundtrip_ms": round(t_noop * 1e3, 2),
        "preprocess_ms": round(t_pre * 1e3, 2),
        "vit_ms": round(t_vit * 1e3, 2),
        "full_ms": round(t_full * 1e3, 2),
        "unaccounted_ms": round((t_full - t_pre - t_vit) * 1e3, 2),
        "full_fps": round(b / t_full, 1),
        "vit_only_fps": round(b / t_vit, 1),
        "vit_tflops": round(vit_tflops, 1),
        "vit_mxu_util_pct": round(100 * vit_tflops / args.peak_tflops, 1),
    }))


if __name__ == "__main__":
    main()
