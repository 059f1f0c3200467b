#!/usr/bin/env python
"""Micro-bench of the banded one-pass forwards (models/banded.py).

Times each pass (student band / teacher band) on DEVICE-RESIDENT inputs
at several chunk buckets, enqueue-N + one readback (loop-chaining big
programs times out the remote compiler — memory note). Reports
f/s-per-pass and achieved TFLOP/s vs the analytic accounting
(utils/flops.banded_pass_flops), separating the banded passes' own rates
from the end-to-end scorer numbers bench.py reports.

Usage: python tools/band_bench.py --buckets 64,128,256,512 [--profile DIR]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--buckets", default="64,128,256,512")
    p.add_argument("--block", type=int, default=32)
    p.add_argument("--dispatches", type=int, default=8)
    p.add_argument("--teacher_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--xla", action="store_true",
                   help="force the XLA banded path (default: the fused "
                        "Pallas kernels, as the scorer dispatches on TPU)")
    p.add_argument("--profile", default="")
    args = p.parse_args()

    from dino_video_summarization_transformer_tpu.utils.cache import (
        enable_compilation_cache)

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dino_video_summarization_transformer_tpu.models import (
        banded, init_timesformer, vit_base_config)
    from dino_video_summarization_transformer_tpu.utils.flops import (
        banded_pass_flops)

    import dataclasses

    cfg = vit_base_config(num_frames=8, num_classes=0)
    params = init_timesformer(jax.random.key(0), cfg)
    if not args.xla:
        cfg = dataclasses.replace(cfg, use_fused=True)
    params_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    t_dtype = jnp.dtype(args.teacher_dtype)
    t_params = (params if t_dtype == jnp.float32 else params_bf16)

    rng = np.random.RandomState(0)

    for bucket in [int(b) for b in args.buckets.split(",")]:
        frames = jax.device_put(
            rng.randn(bucket, 224, 224, 3).astype(np.float32))
        jax.block_until_ready(frames)

        for kind, eff, pp, dt in (
                ("student", 3, params_bf16, jnp.bfloat16),
                ("teacher", 30, t_params, t_dtype)):
            fn = jax.jit(lambda pr, fr, t: banded.banded_cls_features(
                pr, fr.astype(dt), t, cfg, eff=eff, compute_dtype=dt,
                block=args.block))
            t_real = jnp.asarray(bucket, jnp.int32)
            # this tunnel's block_until_ready returns at ENQUEUE (memory
            # note): a host readback is the only honest sync
            np.asarray(fn(pp, frames, t_real))
            if args.profile:
                jax.profiler.start_trace(
                    os.path.join(args.profile, f"{kind}_{bucket}"))
            t0 = time.time()
            outs = [fn(pp, frames, t_real) for _ in range(args.dispatches)]
            np.asarray(outs[-1])  # in-order stream: last done => all done
            dt_s = time.time() - t0
            if args.profile:
                jax.profiler.stop_trace()
            n = args.dispatches * bucket
            fl = banded_pass_flops(cfg, bucket, eff, args.block)
            print(f"C={bucket:4d} {kind:7s} eff={eff:2d}: "
                  f"{n / dt_s:8.1f} f/s-pass  "
                  f"{args.dispatches * fl / dt_s / 1e12:6.1f} TF/s  "
                  f"({dt_s / args.dispatches * 1e3:6.1f} ms/pass)",
                  flush=True)


if __name__ == "__main__":
    main()
