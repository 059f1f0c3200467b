#!/usr/bin/env python
"""Microbenchmark of the scoring pipeline's constituent kernels on the real
chip: establishes the environment's achievable matmul ceiling and breaks the
TimeSformer forward into its matmul/attention parts so MFU work is aimed at
the true bottleneck instead of guessed.

Tunnel-proof methodology:
* operands are generated ON DEVICE (the ~30 MB/s host->device wire would
  otherwise dominate),
* the op under test is iterated inside ONE jitted lax.fori_loop with a tiny
  data dependency between iterations (so XLA can't hoist it), and the
  result is fetched once — on the tunneled axon backend block_until_ready
  returns at enqueue time and every host readback costs a ~40 ms round
  trip, so per-dispatch timing measures only the tunnel.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def _full_shape_bump(out, x):
    """A FULL-RANK data-dependent perturbation of x from out.

    A scalar bump (x += out[0,0]*eps) is useless: XLA's algebraic
    simplifier distributes dot(a + broadcast(s), b) into
    dot(a,b) + s*colsum(b) and hoists the invariant dot out of the loop
    (observed: 'measured' 565 TFLOP/s on a 197-peak chip). A full-rank
    addend makes the distributed form cost another full dot, so the
    simplifier leaves the chain alone.
    """
    flat = out.astype(jnp.float32).ravel()
    n = x.size
    if flat.size >= n:
        bump = jax.lax.slice(flat, (0,), (n,))
    else:
        reps = -(-n // flat.size)
        bump = jnp.concatenate([flat] * reps)[:n]
    return (bump.reshape(x.shape) * 1e-12).astype(x.dtype)


def bench_looped(op, x, args, iters=20, repeats=3):
    """Time `op(x, *args)` chained ``iters`` times inside one jit, with a
    full-rank feedback perturbation per iteration (see _full_shape_bump)."""

    @jax.jit
    def run(x, *args):
        def body(i, x):
            out = op(x, *args)
            return x + _full_shape_bump(out, x)
        return jax.lax.fori_loop(0, iters, body, x)

    _force(run(x, *args))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _force(run(x, *args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def report(name, flops, secs):
    print(f"{name:46s} {secs * 1e3:9.2f} ms   {flops / secs / 1e12:7.2f} TFLOP/s",
          flush=True)


def dev_randn(seed, shape):
    return jax.jit(
        lambda: jax.random.normal(jax.random.key(seed), shape, jnp.bfloat16))()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunk", type=int, default=32)
    p.add_argument("--skip-forwards", action="store_true")
    args = p.parse_args()

    # 1. environment matmul ceiling
    for M, K, N in [(8192, 8192, 8192), (189120, 768, 2304),
                    (189120, 3072, 768)]:
        a = dev_randn(M, (M, K))
        b = dev_randn(M + 1, (K, N))
        secs = bench_looped(lambda a, b: a @ b, a, (b,))
        report(f"matmul {M}x{K}x{N} bf16", 2.0 * M * K * N, secs)

    # 2. attention einsum shapes from the scoring pipeline (teacher chunk)
    B, H, hd = args.chunk, 12, 64
    for name, nseq, L in [("spatial attn (softmax)", B * 30, 197),
                          ("temporal attn (softmax)", B * 196, 30)]:
        q = dev_randn(nseq, (nseq, H, L, hd))
        k = dev_randn(nseq + 1, (nseq, H, L, hd))
        v = dev_randn(nseq + 2, (nseq, H, L, hd))

        def attn(q, k, v):
            s = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (hd ** -0.5)
            s = jax.nn.softmax(s, axis=-1)
            return jnp.einsum("bhnm,bhmd->bhnd", s, v)

        secs = bench_looped(attn, q, (k, v))
        flops = 2 * 2 * nseq * H * L * L * hd
        report(f"{name} ({nseq}x{L})", flops, secs)

    if args.skip_forwards:
        return

    # 3. whole forwards at chunk size, frames resident (pure compute rate)
    from dino_video_summarization_transformer_tpu.models import (
        forward, init_timesformer, vit_base_config)
    from dino_video_summarization_transformer_tpu.utils.cache import (
        enable_compilation_cache)
    from dino_video_summarization_transformer_tpu.utils.flops import (
        timesformer_forward_flops)

    enable_compilation_cache()
    cfg = vit_base_config(num_frames=8, num_classes=0)
    params = init_timesformer(jax.random.key(0), cfg)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    _force(params["cls_token"])

    for name, T, B_ in [("teacher fwd T=30", 30, args.chunk),
                        ("student fwd T=3", 3, args.chunk)]:
        x = dev_randn(T, (B_, 3, T, 224, 224))
        op = lambda x, p: forward(p, x, cfg, compute_dtype=jnp.bfloat16)
        secs = bench_looped(op, x, (params,), iters=8)
        flops = B_ * timesformer_forward_flops(cfg, T)
        report(f"{name} chunk={B_}", flops, secs)
        print(f"    -> {B_ / secs:8.1f} clips/s", flush=True)


if __name__ == "__main__":
    main()
