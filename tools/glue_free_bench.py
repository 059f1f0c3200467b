#!/usr/bin/env python
"""Timing of the glue-free fused forward vs the XLA forward.

Measures the scoring pipeline's two forwards (teacher T=30, student T=3,
ViT-B) with the loop-chained methodology from tools/ablate_forward.py
(the tunnel's block_until_ready returns at enqueue; see
tools/kernel_microbench.py for why naive timing lies here).

r2 context: XLA teacher 918 ms -> per-phase fused kernels 516 ms (chunk
32); the remaining inter-phase glue (full-tensor transposes, CLS
concat/slice) measured ~25% of that. The glue-free path (frame-major
layout end to end, models/timesformer.py divided_block_fused) removes it.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp

from dino_video_summarization_transformer_tpu.models import timesformer as tsf
from ablate_forward import bench, _force


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunk", type=int, default=32)
    args = p.parse_args()

    cfg = tsf.vit_base_config(num_frames=8, num_classes=0)
    cfg_fused = dataclasses.replace(cfg, use_fused=True)
    params = tsf.init_timesformer(jax.random.key(0), cfg)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    _force(params["cls_token"])

    for label, T in [("teacher T=30", 30), ("student T=3", 3)]:
        x = jax.jit(lambda: jax.random.normal(
            jax.random.key(1), (args.chunk, 3, T, 224, 224),
            jnp.bfloat16))()
        _force(x)
        for name, c in [("xla", cfg), ("glue-free fused", cfg_fused)]:
            fwd = lambda p_, x_: tsf.forward(p_, x_, c,
                                             compute_dtype=jnp.bfloat16)
            secs = bench(fwd, params, x)
            fps = args.chunk / secs
            print(f"{label:14s} {name:16s} {secs * 1e3:9.2f} ms"
                  f"  ({fps:7.1f} clips/s)", flush=True)


if __name__ == "__main__":
    main()
