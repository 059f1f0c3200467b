#!/usr/bin/env python
"""Ablation timing of the TimeSformer teacher forward (T=30, ViT-B).

Times the full divided space-time forward with individual components
surgically removed, so the per-component wall cost is the delta to the
baseline — the only reliable decomposition on a backend with ~40 ms fetch
round-trips and no per-op profile. Informs which kernel work actually
moves the scoring pipeline (see tools/kernel_microbench.py for the
methodology caveats)."""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dino_video_summarization_transformer_tpu.models.timesformer import (
    init_timesformer, layer_norm, linear, patch_embed, vit_base_config)


def _force(out):
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])


def mhsa_abl(p, x, num_heads, skip_scores=False, bf16_scores=True):
    B, N, C = x.shape
    H = num_heads
    hd = C // H
    qkv = linear(p["qkv"], x).reshape(B, N, 3, H, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if skip_scores:
        out = v.reshape(B, N, C)
        return linear(p["proj"], out)
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (hd ** -0.5)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
    return linear(p["proj"], out)


def build_forward(cfg, *, no_temporal=False, no_spatial=False,
                  skip_scores=False, no_mlp=False, ln_identity=False,
                  no_softmax=False):
    H_heads = cfg.num_heads

    def ln(p, x):
        if ln_identity:
            return x
        return layer_norm(p, x)

    def attn(p, x, skip):
        B, N, C = x.shape
        hd = C // H_heads
        qkv = linear(p["qkv"], x).reshape(B, N, 3, H_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if skip:
            return linear(p["proj"], v.reshape(B, N, C))
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (hd ** -0.5)
        if not no_softmax:
            s = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", s, v)
        return linear(p["proj"], out.transpose(0, 2, 1, 3).reshape(B, N, C))

    def block(p, x, B, T, Hp, Wp):
        D = x.shape[-1]
        N = Hp * Wp
        if not no_temporal:
            xt = x[:, 1:, :].reshape(B * N, T, D)
            res_t = attn(p["temporal_attn"], ln(p["temporal_norm1"], xt),
                         skip_scores)
            res_t = linear(p["temporal_fc"], res_t.reshape(B, N * T, D))
            xt = x[:, 1:, :] + res_t
        else:
            xt = x[:, 1:, :]
        init_cls = x[:, :1, :]
        if not no_spatial:
            cls_rep = jnp.broadcast_to(init_cls, (B, T, D)).reshape(B * T, 1, D)
            xs = xt.reshape(B, N, T, D).transpose(0, 2, 1, 3).reshape(B * T, N, D)
            xs = jnp.concatenate([cls_rep, xs], axis=1)
            res_s = attn(p["attn"], ln(p["norm1"], xs), skip_scores)
            cls_out = res_s[:, 0, :].reshape(B, T, D).mean(axis=1, keepdims=True)
            res_sp = (res_s[:, 1:, :].reshape(B, T, N, D)
                      .transpose(0, 2, 1, 3).reshape(B, N * T, D))
            x = jnp.concatenate([init_cls, xt], axis=1) + jnp.concatenate(
                [cls_out, res_sp], axis=1)
        else:
            x = jnp.concatenate([init_cls, xt], axis=1)
        if not no_mlp:
            h = linear(p["mlp"]["fc1"], ln(p["norm2"], x))
            h = jax.nn.gelu(h, approximate=False)
            x = x + linear(p["mlp"]["fc2"], h)
        return x

    def fwd(params, x):
        B, C, T, Hi, Wi = x.shape
        ps = cfg.patch_size
        Wp, Hp = Wi // ps, Hi // ps
        N = Hp * Wp
        D = cfg.embed_dim
        x = x.astype(jnp.bfloat16)
        frames = x.transpose(0, 2, 3, 4, 1).reshape(B * T, Hi, Wi, C)
        tok = patch_embed(params["patch_embed"], frames, ps)
        cls = jnp.broadcast_to(params["cls_token"].astype(jnp.bfloat16),
                               (B * T, 1, D))
        xt = jnp.concatenate([cls, tok], axis=1)
        xt = xt + params["pos_embed"].astype(jnp.bfloat16)
        cls_tok = xt[:B, :1, :]
        spat = xt[:, 1:, :].reshape(B, T, N, D).transpose(0, 2, 1, 3)
        te = params["time_embed"]
        idx = jnp.floor(jnp.arange(T) * (te.shape[1] / T)).astype(jnp.int32)
        te = jnp.take(te, idx, axis=1)
        spat = (spat.reshape(B * N, T, D) + te.astype(jnp.bfloat16))
        x = jnp.concatenate([cls_tok, spat.reshape(B, N * T, D)], axis=1)

        def body(carry, bp):
            return block(bp, carry, B, T, Hp, Wp), None

        x, _ = jax.lax.scan(body, x, params["blocks"])
        x = layer_norm(params["norm"], x)
        return x[:, 0]

    return fwd


def bench(fwd, params, x, iters=6, repeats=3):
    @jax.jit
    def run(x, params):
        def body(i, x):
            out = fwd(params, x)  # (B, D) f32-ish
            reps = -(-x.size // out.size)
            bump = jnp.concatenate([out.astype(jnp.float32).ravel()] * reps)
            bump = bump[:x.size].reshape(x.shape) * 1e-12
            return x + bump.astype(x.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    _force(run(x, params))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _force(run(x, params))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunk", type=int, default=32)
    p.add_argument("--frames", type=int, default=30)
    args = p.parse_args()

    cfg = vit_base_config(num_frames=8, num_classes=0)
    params = init_timesformer(jax.random.key(0), cfg)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    _force(params["cls_token"])
    x = jax.jit(lambda: jax.random.normal(
        jax.random.key(1), (args.chunk, 3, args.frames, 224, 224),
        jnp.bfloat16))()
    _force(x)

    variants = [
        ("full", {}),
        ("no_temporal_attn", dict(no_temporal=True)),
        ("no_spatial_attn", dict(no_spatial=True)),
        ("attn_skip_scores", dict(skip_scores=True)),
        ("no_softmax", dict(no_softmax=True)),
        ("no_mlp", dict(no_mlp=True)),
        ("ln_identity", dict(ln_identity=True)),
    ]
    base = None
    for name, kw in variants:
        fwd = build_forward(cfg, **kw)
        secs = bench(fwd, params, x)
        delta = "" if base is None else f"  (delta {1e3 * (base - secs):+8.1f} ms)"
        if base is None:
            base = secs
        print(f"{name:20s} {secs * 1e3:9.2f} ms{delta}", flush=True)


if __name__ == "__main__":
    main()
