"""Pallas vs XLA measurement sweep — run on real TPU hardware.

Round-1 verdict item 5: "win (or honestly retire) the Pallas north
star" — with a table in README at ≥2 geometries, defaults set to the
winner. This tool produces that table:

  variant        what it measures
  -------        ----------------
  xla            plain XLA path: preprocess → conv patch-embed → tower
  pallas         hybrid fused_patch_embed (XLA relayout + Pallas matmul
                 with /255+normalize folded into weights)
  flash          XLA patch embed + Pallas flash attention in the tower
                 (tail-masked, works at ViT's odd token counts)

at two geometries (512×288 decoded-1080p scan; 640×360) in bf16.

Usage (on TPU):  python tools/pallas_sweep.py [--reps 4] [--markdown]
Prints one JSON line per (geometry, variant) plus a final markdown
table ready for README.md, and a recommended USE_PALLAS setting.
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


def measure_variant(variant: str, hw: tuple, batch: int, reps: int
                    ) -> float:
    import jax
    import jax.numpy as jnp

    from avede_tpu.models.clip import init_clip, vit_b32
    from avede_tpu.ops.preprocess import (central_square_crop,
                                          clip_preprocess, resize_frames)

    cfg = dataclasses.replace(vit_b32(), dtype="bfloat16",
                              use_flash=(variant == "flash"))
    model, params = init_clip(cfg, seed=0)
    h, w = hw

    if variant == "pallas":
        from avede_tpu.ops.pallas_kernels import fused_patch_embed

        @jax.jit
        def scan(params, frames_u8, query):
            x = central_square_crop(frames_u8).astype(jnp.float32)
            x = resize_frames(x, cfg.image_size, "bicubic")
            k = params["vision"]["patch_embedding"]["kernel"]
            tokens = fused_patch_embed(
                x, k, jnp.zeros((k.shape[-1],), jnp.float32))
            emb = model.apply({"params": params}, tokens,
                              method=model.encode_image_from_patches)
            return jnp.dot(emb, query, preferred_element_type=jnp.float32)
    else:
        @jax.jit
        def scan(params, frames_u8, query):
            px = clip_preprocess(frames_u8, size=cfg.image_size)
            emb = model.apply({"params": params}, px,
                              method=model.encode_image)
            return jnp.dot(emb, query, preferred_element_type=jnp.float32)

    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, size=(batch, h, w, 3), dtype=np.uint8))
    query = jnp.asarray(np.random.default_rng(1).normal(
        size=(cfg.projection_dim,)).astype(np.float32))
    for _ in range(2):
        np.asarray(scan(params, frames, query))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(scan(params, frames, query))
        best = min(best, (time.perf_counter() - t0) / reps)
    return batch / best


def main() -> None:
    from avede_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--batch", type=int, default=256)
    args = p.parse_args()

    geometries = [(288, 512), (360, 640)]
    variants = ["xla", "pallas", "flash"]
    rows = []
    for hw in geometries:
        for v in variants:
            try:
                fps = measure_variant(v, hw, args.batch, args.reps)
            except Exception as exc:  # noqa: BLE001 — record, keep going
                print(json.dumps({"geometry": f"{hw[1]}x{hw[0]}",
                                  "variant": v, "error": str(exc)[:200]}))
                continue
            rows.append((hw, v, fps))
            print(json.dumps({"geometry": f"{hw[1]}x{hw[0]}",
                              "variant": v,
                              "frames_per_sec": round(fps, 1)}))

    if not rows:
        return
    print("\n| geometry | XLA fps | Pallas patch-embed fps | "
          "flash-attn fps |")
    print("|---|---|---|---|")
    for hw in geometries:
        by = {v: fps for h, v, fps in rows if h == hw}
        print(f"| {hw[1]}×{hw[0]} | " + " | ".join(
            f"{by.get(v, float('nan')):.0f}" for v in variants) + " |")
    xla = [fps for _, v, fps in rows if v == "xla"]
    pal = [fps for _, v, fps in rows if v == "pallas"]
    if xla and pal:
        rec = bool(np.mean(pal) > np.mean(xla) * 1.02)
        print(f"\nrecommended USE_PALLAS={rec} "
              f"(pallas {np.mean(pal):.0f} vs xla {np.mean(xla):.0f} fps)")


if __name__ == "__main__":
    main()
