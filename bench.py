#!/usr/bin/env python
"""Benchmark: frames scored per second per chip (TimeSformer ViT-B).

Measures the core scoring workload (BASELINE.json metric): per-frame DINO
importance scoring with local(3)/global(30) windows on ViT-B/16 divided
space-time attention. Prints ONE JSON line.

Modes:
  exact (default headline): bfloat16 compute, reference window geometry
        (teacher T=30) — same scores as the reference up to bf16 noise.
  exact-f32: float32 + HIGHEST matmuls — bit-parity numerics (~1e-5).
  fast: teacher window subsampled to the model's native T=8 — ~4x faster,
        different (unvalidated) scores; see BENCH.md.

vs_baseline is value / 1000 (the BASELINE.json north-star of 1000
frames/s/chip on v5e).
"""

import argparse
import json
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="exact", choices=["exact", "exact-f32", "fast"])
    p.add_argument("--frames", type=int, default=480)
    p.add_argument("--chunk", type=int, default=0,
                   help="0 = auto (16 exact / 32 fast)")
    p.add_argument("--wire", default="u8", choices=["u8", "f32"])
    p.add_argument("--repeats", type=int, default=5,
                   help="best-of; the shared TPU tunnel has high variance")
    args = p.parse_args()
    if not args.chunk:
        args.chunk = 32 if args.mode == "fast" else 16

    from dino_video_summarization_transformer_tpu.utils.cache import (
        enable_compilation_cache)

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dino_video_summarization_transformer_tpu.data.windows import (
        window_indices)
    from dino_video_summarization_transformer_tpu.engine.scoring import (
        FrameScorer)
    from dino_video_summarization_transformer_tpu.models import (
        init_timesformer, vit_base_config)

    cfg = vit_base_config(num_frames=8, num_classes=0)
    params = init_timesformer(jax.random.key(0), cfg)

    if args.mode == "exact-f32":
        dtype, precision = jnp.float32, "highest"
    else:
        dtype, precision = jnp.bfloat16, None

    scorer = FrameScorer(params, cfg, chunk=args.chunk, compute_dtype=dtype,
                         precision=precision,
                         global_subsample=4 if args.mode == "fast" else 1)

    T = args.frames
    if args.wire == "u8":
        frames = np.random.RandomState(0).randint(
            0, 256, (T, 224, 224, 3), dtype=np.uint8)
    else:
        frames = np.random.RandomState(0).randn(T, 224, 224, 3).astype(np.float32)
    loc, glob, eff = window_indices(T, 3, 30)

    # warmup / compile
    scorer.score_video(frames[:64], loc[:64], glob[:64], eff)

    best = 0.0
    for _ in range(args.repeats):
        t0 = time.time()
        out = scorer.score_video(frames, loc, glob, eff)
        dt = time.time() - t0
        assert np.isfinite(out).all()
        best = max(best, T / dt)

    print(json.dumps({
        "metric": f"frames scored/sec/chip (TimeSformer ViT-B, {args.mode})",
        "value": round(best, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(best / 1000.0, 4),
    }))


if __name__ == "__main__":
    main()
