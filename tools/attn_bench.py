#!/usr/bin/env python
"""Standalone comparison of attention implementations at the two scoring
geometries (spatial 197, temporal 30), with loop-chained timing (see
kernel_microbench.py for why per-dispatch timing lies on this tunnel)."""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dino_video_summarization_transformer_tpu.ops.attention import (
    fused_attention)


def _force(out):
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])


def bench(op, q, k, v, iters=20, repeats=3):
    @jax.jit
    def run(q, k, v):
        def body(i, q):
            out = op(q, k, v)
            return q + out.astype(q.dtype) * 1e-12  # full-rank feedback
        return jax.lax.fori_loop(0, iters, body, q)

    _force(run(q, k, v))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _force(run(q, k, v))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def xla_attn(q, k, v):
    # q/k/v (BH, L, hd) — the production einsum path, bf16 softmax
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bnd,bmd->bnm", q, k) * scale
    s = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bnm,bmd->bnd", s, v)


def xla_attn_packed(q, k, v, G):
    """Pack G sequences into one length-G*L sequence with a block-diagonal
    mask: trades masked flops for MXU tile utilization on tiny L."""
    BH, L, hd = q.shape
    scale = hd ** -0.5
    qp = q.reshape(BH // G, G * L, hd)
    kp = k.reshape(BH // G, G * L, hd)
    vp = v.reshape(BH // G, G * L, hd)
    s = jnp.einsum("bnd,bmd->bnm", qp, kp) * scale
    seq_r = jax.lax.broadcasted_iota(jnp.int32, (G * L, G * L), 0) // L
    seq_c = jax.lax.broadcasted_iota(jnp.int32, (G * L, G * L), 1) // L
    s = jnp.where(seq_r == seq_c, s, jnp.asarray(-jnp.inf, s.dtype))
    s = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bnm,bmd->bnd", s, vp)
    return out.reshape(BH, L, hd)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunk", type=int, default=32)
    args = p.parse_args()
    B = args.chunk
    H, hd = 12, 64

    for name, nseq, L in [("spatial", B * 30, 197),
                          ("temporal", B * 196, 30)]:
        BH = nseq * H
        mk = lambda s: jax.jit(lambda: jax.random.normal(
            jax.random.key(s), (BH, L, hd), jnp.bfloat16))()
        q, k, v = mk(0), mk(1), mk(2)
        _force(q), _force(k), _force(v)
        flops = 4 * BH * L * L * hd

        secs = bench(xla_attn, q, k, v)
        print(f"{name} XLA einsum        {secs * 1e3:8.2f} ms "
              f"{flops / secs / 1e12:7.2f} TFLOP/s", flush=True)

        for bb in (8, 16, 32):
            op = partial(fused_attention, scale=hd ** -0.5, block_b=bb)
            secs = bench(op, q, k, v)
            print(f"{name} pallas bb={bb:<3d}     {secs * 1e3:8.2f} ms "
                  f"{flops / secs / 1e12:7.2f} TFLOP/s", flush=True)

        if L <= 64:
            for G in (2, 4, 8):
                op = partial(xla_attn_packed, G=G)
                secs = bench(op, q, k, v)
                print(f"{name} XLA packed G={G}    {secs * 1e3:8.2f} ms "
                      f"{flops / secs / 1e12:7.2f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
