#!/usr/bin/env python
"""Probe the teacher-CLS leave-one-out interpolation error distribution.

Calibrates ``ScorerConfig.teacher_refine`` (the error-adaptive refinement
threshold): for each validator config, compute the stride-k teacher CLS
features over the synthetic validator corpus and print percentiles of the
relative LOO error ||t_j - lerp(t_{j-1}, t_{j+1})|| / ||t_j|| — the exact
statistic the refinement thresholds on. A good alpha separates the
production arch's smooth curves (below) from feature-noisy configs
(above), so refinement spends teacher FLOPs only where interpolation is
measurably failing.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stride", type=int, default=8)
    p.add_argument("--videos", type=int, default=4)
    p.add_argument("--frames", type=int, default=240)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from dino_video_summarization_transformer_tpu.data.windows import (
        window_indices)
    from dino_video_summarization_transformer_tpu.models import (
        init_timesformer, timesformer as tsf, vit_base_config,
        vit_small_config, vit_tiny_config)
    from dino_video_summarization_transformer_tpu.utils.synthetic import (
        make_video)

    configs = [("vit_tiny", 32, vit_tiny_config, args.frames),
               ("vit_small", 96, vit_small_config, args.frames),
               ("vit_small", 224, vit_small_config, 120),
               ("vit_base", 224, vit_base_config, 120)]
    mean = np.array([0.45] * 3, np.float32)
    std = np.array([0.225] * 3, np.float32)

    for arch, img, cfg_fn, T in configs:
        cfg = cfg_fn(num_frames=8, num_classes=0, img_size=img)
        params = init_timesformer(jax.random.key(0), cfg)
        _, glob, eff = window_indices(T, 3, 30)
        fwd = jax.jit(lambda p, x: tsf.forward(
            p, x, cfg, compute_dtype=jnp.float32))
        errs = []
        for s in range(args.videos):
            v = make_video(s, T, img)
            vf = ((v.astype(np.float32) / 255.0) - mean) / std
            tpos = np.arange(0, T, args.stride)
            if tpos[-1] != T - 1:
                tpos = np.append(tpos, T - 1)
            feats = []
            B = 16
            for c0 in range(0, len(tpos), B):
                wins = np.stack([vf[glob[i]] for i in tpos[c0:c0 + B]])
                wins = wins.transpose(0, 4, 1, 2, 3)
                feats.append(np.asarray(fwd(params, jnp.asarray(wins))))
            f = np.concatenate(feats).astype(np.float64)
            w = ((tpos[1:-1] - tpos[:-2]) /
                 np.maximum(tpos[2:] - tpos[:-2], 1))[:, None]
            t_hat = f[:-2] * (1 - w) + f[2:] * w
            e = (np.linalg.norm(f[1:-1] - t_hat, axis=-1)
                 / (np.linalg.norm(f[1:-1], axis=-1) + 1e-6))
            errs.append(e)
        e = np.concatenate(errs)
        q = np.percentile(e, [10, 50, 90, 99])
        print(f"{arch}@{img:3d} k={args.stride}: LOO rel err "
              f"p10 {q[0]:.4f}  p50 {q[1]:.4f}  p90 {q[2]:.4f}  "
              f"p99 {q[3]:.4f}  max {e.max():.4f}", flush=True)


if __name__ == "__main__":
    main()
