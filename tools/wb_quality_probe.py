#!/usr/bin/env python
"""Quality probe for whole-block fused teachers (XLA emulation, no kernel).

Question: if the divided block kept its carry in f32 *within* the block
and rounded to bf16 only at block boundaries, would the teacher keep the
mixed tier's quality at near-bf16 HBM cost?

MEASURED ANSWER: **no** — bf16 block boundaries cost real quality
(composite 3.7% vs the mixed tier's 1.0% on ViT-B@224, via the real wb
kernels). An earlier version of this probe claimed they were free; that
run was an artifact: it emulated the boundary with
``x.astype(bf16).astype(f32)``, and the terminal's
``--xla_allow_excess_precision=true`` lets XLA ELIDE such round-trip
casts — the "wb" row was bit-identical to pure mixed. The probe now uses
``jax.lax.reduce_precision``, which XLA must honor. Lesson recorded here
because it is exactly the kind of trap a numerics emulation falls into
on this stack.

The production conclusion lives in ops/fused_block.py: the wb two-kernel
block keeps f32 boundaries for the mixed tier (same numerics, 1/3 less
carry HBM) and bf16 boundaries only for the bf16 tier (floor 6.1% ->
4.2%).

Run on the TPU (the kernels need the real backend for honest numerics,
though interpret mode works too).
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def teacher_forward_wb(params, x, cfg, boundary_dtype=jnp.bfloat16):
    """forward_features with f32 in-block numerics and ``boundary_dtype``
    casts of (cls, grid) between blocks — the whole-block-kernel numerics
    emulated in XLA (per-phase fused kernels supply the kernel-internal
    bf16 roundings)."""
    from dino_video_summarization_transformer_tpu.models import (
        timesformer as tsf)

    B, C, T, Himg, Wimg = x.shape
    ps = cfg.patch_size
    W = Himg // ps
    H = Himg // ps
    N = H * W
    D = cfg.embed_dim

    x = x.astype(jnp.float32)
    frames = x.transpose(0, 2, 3, 4, 1).reshape(B * T, Himg, Wimg, C)
    tok = tsf.patch_embed(params["patch_embed"], frames, ps)
    cls = jnp.broadcast_to(params["cls_token"].astype(jnp.float32),
                           (B * T, 1, D))
    xt = jnp.concatenate([cls, tok], axis=1)
    pe = params["pos_embed"]
    if xt.shape[1] != pe.shape[1]:
        pe = tsf.resize_pos_embed(pe, xt.shape[1], W)
    xt = xt + pe.astype(jnp.float32)

    cls_tok = xt[:B, :1, :]
    spat = xt[:, 1:, :]
    spat = spat.reshape(B, T, N, D).transpose(0, 2, 1, 3).reshape(B * N, T, D)
    te = params["time_embed"]
    if T != te.shape[1]:
        te = tsf.interp_nearest_1d(te, T, axis=1)
    spat = spat + te.astype(jnp.float32)
    spat = spat.reshape(B, N * T, D)

    # The block boundary rounding. NOT astype(bf16).astype(f32): under
    # --xla_allow_excess_precision (set on this terminal) XLA may elide
    # the round trip entirely — reduce_precision is the primitive XLA
    # must honor (bf16 = 8 exponent bits, 7 mantissa bits).
    def _round(v):
        if jnp.dtype(boundary_dtype) == jnp.float32:
            return v
        return jax.lax.reduce_precision(v, 8, 7)

    cls_tok = _round(cls_tok)
    spat = _round(spat)

    def body(carry, bp):
        c, g = tsf.divided_block(bp, carry[0], carry[1], B, T, H, W,
                                 cfg.num_heads, use_fused=True)
        return (_round(c), _round(g)), None

    (cls_tok, _), _ = jax.lax.scan(body, (cls_tok, spat), params["blocks"])
    return tsf.layer_norm(params["norm"], cls_tok, eps=cfg.norm_eps)[:, 0]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="vit_base")
    p.add_argument("--img", type=int, default=224)
    p.add_argument("--videos", type=int, default=3)
    p.add_argument("--frames", type=int, default=120)
    p.add_argument("--chunk", type=int, default=16)
    args = p.parse_args()

    from dino_video_summarization_transformer_tpu.data.windows import (
        window_indices)
    from dino_video_summarization_transformer_tpu.engine.scoring import (
        FrameScorer)
    from dino_video_summarization_transformer_tpu.models import (
        init_timesformer, vit_base_config, vit_small_config, vit_tiny_config)
    from dino_video_summarization_transformer_tpu.train.dino import (
        scoring_dino_loss)
    from dino_video_summarization_transformer_tpu.utils.cache import (
        enable_compilation_cache)
    from dino_video_summarization_transformer_tpu.utils.synthetic import (
        make_video)
    from validate_fast_scoring import (
        selection_agreement, spearman, teacher_saturation)

    enable_compilation_cache()

    cfg_fn = {"vit_base": vit_base_config, "vit_small": vit_small_config,
              "vit_tiny": vit_tiny_config}[args.arch]
    cfg = cfg_fn(num_frames=8, num_classes=0, img_size=args.img)
    params = init_timesformer(jax.random.key(0), cfg)
    T, chunk = args.frames, args.chunk
    loc, glob, eff = window_indices(T, 3, 30)
    videos = [make_video(s, T, args.img) for s in range(args.videos)]

    sample_pos = list(range(0, T, max(1, T // 8)))
    t_temp = 0.02
    sat = teacher_saturation(params, cfg, videos[0], glob, sample_pos,
                             temp=t_temp)
    while not sat["live"] and t_temp < 0.3:
        t_temp *= 2.0
        sat = teacher_saturation(params, cfg, videos[0], glob, sample_pos,
                                 temp=t_temp)
    print(f"saturation: {sat} (teacher_temp {t_temp})", flush=True)

    # oracle: exact f32 scorer (mixed-tier oracle, same as the validator)
    exact_scorer = FrameScorer(params, cfg, chunk=chunk, teacher_temp=t_temp,
                               compute_dtype=np.float32, precision=None)
    exact = [exact_scorer.score_video(v, loc, glob, eff) for v in videos]
    print("oracle done", flush=True)

    # Manual scoring: bf16 student (fused) + teacher variant
    cfg_fused = dataclasses.replace(cfg, use_fused=True)
    params_bf = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    from dino_video_summarization_transformer_tpu.models import forward

    mean = np.array([0.45] * 3, np.float32)
    std = np.array([0.225] * 3, np.float32)

    # params as ARGUMENTS: closing over them embeds ~0.5 GB of constants
    # in the program and the remote compiler rejects the payload (HTTP 413)
    @jax.jit
    def _student_feats(p, x):
        return forward(p, x, cfg_fused,
                       compute_dtype=jnp.bfloat16).astype(jnp.float32)

    @jax.jit
    def _teacher_mt(p, x):  # shipped turbo-mt teacher: f32 carries
        return forward(p, x, cfg_fused,
                       compute_dtype=jnp.float32).astype(jnp.float32)

    @jax.jit
    def _teacher_bf16(p, x):
        return forward(p, x, cfg_fused,
                       compute_dtype=jnp.bfloat16).astype(jnp.float32)

    @jax.jit
    def _teacher_wb(p, x):  # whole-block emulation: bf16 block boundaries
        return teacher_forward_wb(p, x, cfg).astype(jnp.float32)

    student_feats = lambda x: _student_feats(params_bf, x)
    teacher_mt = lambda x: _teacher_mt(params, x)
    teacher_bf16 = lambda x: _teacher_bf16(params_bf, x)
    teacher_wb = lambda x: _teacher_wb(params, x)

    def score(video, teacher_fn):
        vf = ((video.astype(np.float32) / 255) - mean) / std
        losses = []
        for c0 in range(0, T, chunk):
            rows = np.arange(c0, min(c0 + chunk, T))
            lw = np.stack([vf[loc[i]] for i in rows]).transpose(0, 4, 1, 2, 3)
            gw = np.stack([vf[glob[i]] for i in rows]).transpose(0, 4, 1, 2, 3)
            s = student_feats(jnp.asarray(lw, jnp.bfloat16))
            t = teacher_fn(jnp.asarray(gw))
            losses.append(np.asarray(scoring_dino_loss(
                s, t, teacher_temp=t_temp, student_temp=0.3)))
        return np.concatenate(losses)

    for name, tf, cast in [("bf16-floor", teacher_bf16, jnp.bfloat16),
                           ("mt (f32 carries)", teacher_mt, jnp.float32),
                           ("WB (bf16 boundaries)", teacher_wb, jnp.float32)]:
        sp, re, ag = [], [], []
        for ex, v in zip(exact, videos):
            fs = score(v, tf)
            sp.append(spearman(ex, fs))
            re.append(float(np.abs(fs - ex).mean() / ex.mean()))
            ag.append(selection_agreement(ex, fs, 16, 4, T))
        print(f"{name:22s} spearman_min {min(sp):.4f}  "
              f"relerr_max {max(re):.4f}  relerr_mean {np.mean(re):.4f}  "
              f"sel_agree {np.mean(ag):.3f}", flush=True)


if __name__ == "__main__":
    main()
