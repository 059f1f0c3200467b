#!/usr/bin/env python
"""Sweep the fused whole-block kernels' block sizes on the real chip.

The forward kernels pick their frame/position block from a padded-row VMEM
budget (ops/fused_block.py). The budget determines the M dimension of every
dense matmul inside the kernel (M = block_f * 197 for the spatial kernel,
block_n * T for the temporal one): at block_f=1 the spatial+MLP kernel's
matmuls run M=197 -> 2 MXU M-tiles of 128 -> ~35% padding waste. This tool
times ONE wb kernel pair (temporal_tm f32-carry out + spatial_mlp) at
teacher and student shapes across block choices, loop-chained (the only
honest timing on the tunnel — see tools/kernel_microbench.py).

Usage: python tools/fwd_block_sweep.py [--chunk 32] [--frames 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dino_video_summarization_transformer_tpu.utils.cache import (
    enable_compilation_cache)

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])


def bench_pair(p_blk, x, num_heads, block_n, block_f, iters=8, repeats=3):
    """Time temporal_tm (bf16 -> f32 carry) + spatial_mlp (f32 -> bf16)
    loop-chained through a full-rank bf16 feedback bump."""
    from dino_video_summarization_transformer_tpu.ops import fused_block as fb

    cls0 = jnp.zeros((x.shape[0], 1, x.shape[-1]), jnp.bfloat16)

    @jax.jit
    def run(x, p):
        def body(i, x):
            x1 = fb._fused_temporal_phase_tm_impl(
                p["temporal_norm1"], p["temporal_attn"], p["temporal_fc"],
                x, num_heads, block_n=block_n, out_dtype=jnp.float32)
            g, cls_rows = fb._fused_spatial_mlp_impl(
                p["norm1"], p["attn"], p["norm2"], p["mlp"], cls0, x1,
                num_heads, block_f=block_f, out_dtype=jnp.bfloat16)
            return (x + g * jnp.bfloat16(1e-3)).astype(x.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    _force(run(x, p_blk))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _force(run(x, p_blk))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--blocks_n", type=str, default="0,14,28,49,98")
    ap.add_argument("--blocks_f", type=str, default="0,1,2,4,6,10")
    args = ap.parse_args()

    from dino_video_summarization_transformer_tpu.models.timesformer import (
        init_timesformer, vit_base_config)

    cfg = vit_base_config(num_frames=8, num_classes=0)
    params = init_timesformer(jax.random.key(0), cfg)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    blk = jax.tree.map(lambda a: a[0], params["blocks"])
    _force(blk["norm1"]["scale"])

    B, T, N, D = args.chunk, args.frames, 196, cfg.embed_dim
    x = jax.jit(lambda: jax.random.normal(
        jax.random.key(1), (B, T, N, D), jnp.bfloat16))()
    _force(x)

    # analytic FLOPs of one block pair (temporal + spatial attn + MLP)
    L = N + 1
    flops = (B * N * T * (10 * D * D + 4 * T * D)
             + B * T * L * (8 * D * D + 4 * L * D)
             + 4 * B * T * N * D * 3072)

    bns = [int(v) for v in args.blocks_n.split(",")]
    bfs = [int(v) for v in args.blocks_f.split(",")]
    print(f"shape B={B} T={T} N={N} D={D}; one-block-pair TFLOP "
          f"{flops/1e12:.3f}", flush=True)
    results = {}
    for bn in bns:
        for bf in bfs:
            try:
                secs = bench_pair(blk, x, cfg.num_heads, bn, bf)
            except Exception as e:  # VMEM overflow etc.
                print(f"bn={bn:3d} bf={bf:2d}  FAILED: {str(e)[:100]}",
                      flush=True)
                continue
            tfs = flops / secs / 1e12
            results[(bn, bf)] = secs
            print(f"bn={bn:3d} bf={bf:2d}  {secs*1e3:8.2f} ms"
                  f"  {tfs:6.1f} TFLOP/s", flush=True)
    if results:
        (bn, bf), secs = min(results.items(), key=lambda kv: kv[1])
        print(f"best: bn={bn} bf={bf}  {secs*1e3:.2f} ms")


if __name__ == "__main__":
    main()
