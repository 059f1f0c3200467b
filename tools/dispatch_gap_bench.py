#!/usr/bin/env python
"""Decompose the gap between score_video end-to-end time and the sum of
its kernel times (the residual = host dispatch + wire + stream bubbles).

Methodology: kernel times come from loop-chained jits on fixed device
inputs (tools/ablate_forward.bench — the only honest timing on a tunnel
whose block_until_ready returns at enqueue); the end-to-end number is the
real scorer.score_video wall time on host frames, exactly what bench.py
reports. The difference is the overhead the pipeline work should target:

  e2e  =  teacher kernels + student kernels + (wire not overlapped)
        + (host chunk-prep / enqueue latency) + (stream bubbles)

Prints a table of: per-kernel time, kernel-sum, measured e2e, residual,
and the wire's standalone transfer time for context.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from ablate_forward import bench, _force


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunk", type=int, default=32)
    p.add_argument("--frames", type=int, default=480)
    p.add_argument("--mode", default="turbo-mt",
                   choices=["turbo", "turbo-mt", "exact"])
    p.add_argument("--repeats", type=int, default=4)
    args = p.parse_args()

    from dino_video_summarization_transformer_tpu.data.windows import (
        window_indices)
    from dino_video_summarization_transformer_tpu.data.yuv import pack_rgb
    from dino_video_summarization_transformer_tpu.engine.scoring import (
        FrameScorer)
    from dino_video_summarization_transformer_tpu.models import (
        init_timesformer, vit_base_config)

    cfg = vit_base_config(num_frames=8, num_classes=0)
    params = init_timesformer(jax.random.key(0), cfg)
    t_stride = 1 if args.mode == "exact" else 4
    t_dtype = jnp.float32 if args.mode == "turbo-mt" else None
    scorer = FrameScorer(params, cfg, chunk=args.chunk,
                         compute_dtype=jnp.bfloat16, precision=None,
                         teacher_stride=t_stride, teacher_dtype=t_dtype)

    T = args.frames
    rgb = np.random.RandomState(0).randint(0, 256, (T, 224, 224, 3),
                                           dtype=np.uint8)
    frames = pack_rgb(rgb)
    loc, glob, eff = window_indices(T, 3, 30)

    # --- end-to-end (what bench.py measures) --------------------------------
    scorer.score_video(frames[:64], loc[:64], glob[:64], eff)  # warm
    e2e = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        out = scorer.score_video(frames, loc, glob, eff)
        e2e.append(time.perf_counter() - t0)
    assert np.isfinite(out).all()
    e2e_best = min(e2e)

    # --- kernel-only times on fixed device inputs ---------------------------
    # shapes exactly as _run_chunks_async dispatches them
    chunk = args.chunk
    teacher_fn, student_fn = scorer._get_split(eff)
    pos = np.arange(T)
    tpos = scorer._teacher_positions(pos, frames)
    n_tchunks = -(-len(tpos) // chunk)
    n_schunks = -(-T // chunk)

    # device span: teacher chunk of 32 windows reaches ~30+chunk frames ->
    # 2 pieces of 64; use the real span size score_video computes
    P = scorer.piece
    hi = int(glob[tpos[:chunk]].max())
    K_t = hi // P + 1
    hi_s = int(loc[pos[:chunk]].max())
    K_s = hi_s // P + 1
    span_t = jax.device_put(frames[:K_t * P])
    span_s = jax.device_put(frames[:K_s * P])
    g_idx = jnp.asarray(glob[tpos[:chunk]])
    l_idx = jnp.asarray(loc[pos[:chunk]])
    t_feats = jax.device_put(
        np.random.RandomState(1).randn(chunk, cfg.embed_dim)
        .astype(np.float32))
    _force(span_t)

    pp = (scorer.params, scorer.t_params)

    def t_kernel(pr, span):
        return teacher_fn(pr, span, g_idx)

    def s_kernel(pr, span):
        return student_fn(pr, span, l_idx, t_feats)

    # loop-chain via a uint8 bump on the span (full-rank feedback)
    def bench_u8(fwd, span, out_dim):
        @jax.jit
        def run(span, pr):
            def body(i, s):
                o = fwd(pr, s).astype(jnp.float32).ravel()
                reps = -(-s.size // o.size)
                bump = jnp.concatenate([o] * reps)[:s.size]
                return s ^ (bump.reshape(s.shape).astype(jnp.uint8) & 1)
            return jax.lax.fori_loop(0, 6, body, span)
        _force(run(span, pp))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _force(run(span, pp))
            best = min(best, (time.perf_counter() - t0) / 6)
        return best

    t_t = bench_u8(t_kernel, span_t, cfg.embed_dim)
    t_s = bench_u8(s_kernel, span_s, 1)

    # --- wire: standalone upload of the whole video -------------------------
    x = jax.device_put(frames)
    np.asarray(x.ravel()[:1])
    t0 = time.perf_counter()
    x = jax.device_put(frames)
    np.asarray(x.ravel()[:1])
    t_wire = time.perf_counter() - t0

    ksum = n_tchunks * t_t + n_schunks * t_s
    print(f"mode {args.mode}  T={T}  chunk={chunk}")
    print(f"teacher kernel : {t_t*1e3:8.2f} ms x {n_tchunks:3d} chunks"
          f" = {n_tchunks*t_t:6.3f} s")
    print(f"student kernel : {t_s*1e3:8.2f} ms x {n_schunks:3d} chunks"
          f" = {n_schunks*t_s:6.3f} s")
    print(f"kernel sum     : {ksum:6.3f} s  ({T/ksum:7.1f} f/s ceiling)")
    print(f"wire (36 MB)   : {t_wire:6.3f} s  (overlapped in the pipeline)")
    print(f"e2e best-of-{args.repeats} : {e2e_best:6.3f} s"
          f"  ({T/e2e_best:7.1f} f/s)   all: "
          + " ".join(f"{T/t:.1f}" for t in e2e))
    print(f"residual       : {e2e_best-ksum:6.3f} s"
          f"  ({100*(e2e_best-ksum)/e2e_best:5.1f}% of e2e)")


if __name__ == "__main__":
    main()
