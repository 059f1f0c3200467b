#!/usr/bin/env python
"""SSL train-step timing: glue-free fused kernels (fwd + custom-VJP bwd)
vs the XLA phases (ViT-B, DINO protocol shapes).

The step chains on its own state (state_{i+1} = f(state_i)), so the loop
cannot be hoisted by XLA's simplifier and one final scalar fetch times N
real steps — the tunnel-safe pattern (tools/kernel_microbench.py).

Ref hot loop being beaten: /root/reference/train_ssl.py:466-569.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dino_video_summarization_transformer_tpu.models import timesformer as tsf
from dino_video_summarization_transformer_tpu.train.ssl import (
    init_train_state, make_train_step)
from dino_video_summarization_transformer_tpu.utils.flops import (
    V5E_PEAK_BF16, train_step_flops)


def bench_step(mcfg, B, n_local, iters=4, repeats=3, seed=0, remat=False):
    state, core, mask = init_train_state(
        jax.random.key(seed), mcfg, out_dim=4096, optimizer="adamw")
    step_fn = make_train_step(
        mcfg, core, mask, n_local_crops=n_local, clip_grad=3.0,
        compute_dtype=jnp.bfloat16, donate=True, remat=remat)
    T = mcfg.num_frames
    g = jax.jit(lambda: jax.random.normal(
        jax.random.key(1), (2 * B, 3, T, 224, 224), jnp.bfloat16))()
    l = jax.jit(lambda: jax.random.normal(
        jax.random.key(2), (n_local * B, 3, T, 96, 96), jnp.bfloat16))()
    np.asarray(l[:1, :1, :1, :1, :1])

    def run(state):
        for _ in range(iters):
            state, metrics = step_fn(state, g, l, 1e-4, 0.04, 0.996, 0.04,
                                     True)
        return state, metrics

    state, metrics = run(state)  # compile + warm (donated: thread state)
    float(metrics["loss"])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, m = run(state)
        float(m["loss"])  # forces the whole chain through the tunnel
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2, help="B per device")
    p.add_argument("--local_crops", type=int, default=8)
    args = p.parse_args()

    cfg = tsf.vit_base_config(num_frames=8, num_classes=0, drop_path_rate=0.0)
    fused = dataclasses.replace(cfg, use_fused=True)
    B = args.batch
    # XLA without remat OOMs even at B=2 (the scan backward stores every
    # phase activation incl. (12, BT, 12, 197, 197) attention probs); the
    # fused path's recompute-in-kernel VJP saves only each phase's INPUT,
    # so it runs un-rematerialized — and at 2x the batch. Baseline is the
    # only XLA config that fits: remat.
    variants = [
        ("xla-remat", cfg, B, True),
        ("fused", fused, B, False),
        # graceful degradation (r5): the un-rematerialized fused step's
        # saved phase inputs exceed HBM at B>=4 (measured: 16.57G of
        # 15.75G — an HBM limit, NOT the r4-suspected Mosaic scoped-vmem
        # clamp, which tools/vmem_probe.py now measures at ~98 MB) — the
        # remat row keeps large batches running instead of failing
        ("fused-remat", fused, B, True),
        ("fused-2B", fused, 2 * B, False),
    ]
    results = {}
    for name, c, b, remat in variants:
        flops = train_step_flops(c, b, n_local_crops=args.local_crops,
                                 local_size_px=96)
        try:
            secs = bench_step(c, b, args.local_crops, remat=remat)
        except Exception as e:  # HBM OOM at this geometry: report, go on
            msg = str(e)
            kind = ("HBM OOM" if "memory" in msg or "RESOURCE" in msg
                    else "failed")
            print(f"{name:11s} B={b}  {kind}: {msg.splitlines()[0][:100]}",
                  flush=True)
            continue
        tflops = flops / secs / 1e12
        mfu = flops / secs / V5E_PEAK_BF16
        results[name] = flops / secs
        print(f"{name:11s} B={b}  {secs * 1e3:9.1f} ms/step "
              f"{tflops:6.1f} TFLOP/s   MFU {mfu:.1%}", flush=True)
    base = results.get("xla-remat")
    fused_rates = [v for k, v in results.items() if k.startswith("fused")]
    if base and fused_rates:
        print(f"speedup vs XLA-remat baseline: {max(fused_rates) / base:.2f}x")


if __name__ == "__main__":
    main()
