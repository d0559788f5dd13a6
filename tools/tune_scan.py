"""Scan-path tuning sweep — run on real TPU hardware.

Sweeps the knobs that move the phase-1 device path (batch size, compute
dtype, resize method, donation) and prints a ranked table; the winner's
settings go into ``bench.py``/``Settings``. Usage:

    python tools/tune_scan.py [--quick]
"""

from __future__ import annotations

import argparse
import dataclasses
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure(batch: int, dtype: str, method: str, donate: bool,
            reps: int) -> float:
    import jax
    import jax.numpy as jnp

    from avede_tpu.models.clip import init_clip, vit_b32
    from avede_tpu.ops.preprocess import (CLIP_MEAN, CLIP_STD,
                                          central_square_crop,
                                          resize_frames)

    cfg = dataclasses.replace(vit_b32(), dtype=dtype)
    model, params = init_clip(cfg, seed=0)

    def scan(params, frames_u8, query):
        # preprocess in the tower dtype, like ClipEngine._image_fn_locked
        # (the bf16 resize is an ~8% whole-scan win; drift ≤2.3e-4 cos)
        d = jnp.dtype(dtype)
        x = central_square_crop(frames_u8).astype(d) / jnp.asarray(255.0, d)
        x = resize_frames(x, cfg.image_size, method)
        x = (x - CLIP_MEAN.astype(d)) / CLIP_STD.astype(d)
        emb = model.apply({"params": params}, x,
                          method=model.encode_image)
        return jnp.dot(emb, query, preferred_element_type=jnp.float32)

    fn = jax.jit(scan, donate_argnums=(1,) if donate else ())
    frames = np.random.default_rng(0).integers(
        0, 255, size=(batch, 288, 512, 3), dtype=np.uint8)
    query = jnp.asarray(np.random.default_rng(1).normal(
        size=(cfg.projection_dim,)).astype(np.float32))

    # pipelined-throughput methodology (same as bench.py): batches
    # dispatch back-to-back with one block per trial, so the tunnel's
    # per-call host RTT is amortized exactly as the product's
    # embed_stream amortizes it.
    def once():
        fd = jnp.asarray(frames)  # re-transfer when donating
        return fn(params, fd, query)

    if not donate:
        fd = jnp.asarray(frames)
        run = lambda: fn(params, fd, query)
    else:
        run = once
    for _ in range(2):
        np.asarray(run())
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = run()
        # materialize the last batch instead of block_until_ready: the
        # axon tunnel's block_until_ready has been observed to return
        # before execution; in-order execution makes the final D2H a
        # correct (and conservative) sync point
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return batch / best


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--batches", type=str, default=None,
                        help="comma list, e.g. 256,512,1024 — sweeps "
                             "batch only (bf16 bicubic)")
    args = parser.parse_args()

    grid = {
        "batch": [128, 256, 512],
        "dtype": ["bfloat16", "float32"],
        "method": ["bicubic", "bilinear"],
        "donate": [False],
    }
    if args.quick:
        grid["batch"] = [256]
        grid["dtype"] = ["bfloat16"]
    if args.batches:
        grid["batch"] = [int(b) for b in args.batches.split(",")]
        grid["dtype"] = ["bfloat16"]
        grid["method"] = ["bicubic"]

    rows = []
    for batch, dtype, method, donate in itertools.product(
            grid["batch"], grid["dtype"], grid["method"], grid["donate"]):
        try:
            fps = measure(batch, dtype, method, donate, reps=5)
        except Exception as exc:  # noqa: BLE001
            print(f"batch={batch} {dtype} {method}: FAILED {exc}")
            continue
        rows.append({"batch": batch, "dtype": dtype, "method": method,
                     "fps": round(fps, 1)})
        print(json.dumps(rows[-1]))
    rows.sort(key=lambda r: -r["fps"])
    print("\nbest:", json.dumps(rows[0]) if rows else "none")


if __name__ == "__main__":
    main()
