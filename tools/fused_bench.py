#!/usr/bin/env python
"""Correctness + speed of the fused block-phase kernels (ops/fused_block)
against the XLA phases, standalone and inside the full teacher/student
forwards."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dino_video_summarization_transformer_tpu.models import timesformer as tsf
from dino_video_summarization_transformer_tpu.models import (
    forward, init_timesformer, vit_base_config)
from dino_video_summarization_transformer_tpu.ops import fused_block as fb
from dino_video_summarization_transformer_tpu.utils.flops import (
    timesformer_forward_flops)


def _force(out):
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])


def bench_fwd(fwd, params, x, iters=6, repeats=3):
    @jax.jit
    def run(x, params):
        def body(i, x):
            out = fwd(params, x)
            reps = -(-x.size // out.size)
            bump = jnp.concatenate([out.astype(jnp.float32).ravel()] * reps)
            return x + (bump[:x.size].reshape(x.shape) * 1e-12).astype(x.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    _force(run(x, params))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _force(run(x, params))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    cfg = vit_base_config(num_frames=8, num_classes=0)
    params = init_timesformer(jax.random.key(0), cfg)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    _force(params["cls_token"])
    blk0 = jax.tree.map(lambda a: a[0], params["blocks"])

    # --- correctness: fused phases vs f32 XLA phases ---------------------
    for name, S, L in [("spatial", 60, 197), ("temporal", 392, 30)]:
        x = jax.jit(lambda: jax.random.normal(
            jax.random.key(2), (S, L, 768), jnp.bfloat16))()
        pn, pa = blk0["norm1"], blk0["attn"]
        want = tsf.attn_phase(
            jax.tree.map(lambda a: a.astype(jnp.float32), pn),
            jax.tree.map(lambda a: a.astype(jnp.float32), pa),
            x.astype(jnp.float32), cfg.num_heads)
        got = fb.fused_attn_phase(pn, pa, x, cfg.num_heads)
        err = np.abs(np.asarray(got, np.float32) - np.asarray(want)).max()
        scale = np.abs(np.asarray(want)).max()
        print(f"attn_phase {name}: max abs err {err:.4e} "
              f"(rel {err / scale:.4e})", flush=True)

    xm = jax.jit(lambda: jax.random.normal(
        jax.random.key(3), (11, 535, 768), jnp.bfloat16))()
    want = tsf.mlp_phase(
        jax.tree.map(lambda a: a.astype(jnp.float32), blk0["norm2"]),
        jax.tree.map(lambda a: a.astype(jnp.float32), blk0["mlp"]),
        xm.astype(jnp.float32))
    got = fb.fused_mlp_phase(blk0["norm2"], blk0["mlp"], xm)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want)).max()
    print(f"mlp_phase: max abs err {err:.4e} "
          f"(rel {err / np.abs(np.asarray(want)).max():.4e})", flush=True)

    # --- full forwards ---------------------------------------------------
    import dataclasses

    for label, enable in [("XLA", False), ("fused", True)]:
        run_cfg = dataclasses.replace(cfg, use_fused=enable)
        for name, T, B in [("teacher T=30", 30, 32), ("student T=3", 3, 32)]:
            x = jax.jit(lambda: jax.random.normal(
                jax.random.key(T), (B, 3, T, 224, 224), jnp.bfloat16))()
            _force(x)
            fwd = lambda p, x: forward(p, x, run_cfg,
                                       compute_dtype=jnp.bfloat16)
            secs = bench_fwd(fwd, params, x)
            fl = B * timesformer_forward_flops(cfg, T)
            print(f"{label:6s} {name:14s} {secs * 1e3:8.2f} ms  "
                  f"{fl / secs / 1e12:6.2f} TFLOP/s  {B / secs:7.1f} clips/s",
                  flush=True)


if __name__ == "__main__":
    main()
