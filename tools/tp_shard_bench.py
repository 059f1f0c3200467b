#!/usr/bin/env python
"""Per-shard timing of the TP-fused kernels vs the XLA TP path.

This box has ONE chip, so a real TP=2 step cannot run here; what decides
the TP-fused promotion is the PER-DEVICE work (the psums are identical
in both paths and ride ICI on a pod). This tool times one shard's slice
of a divided block — half the heads (Hl = H/tp) on the full-width
activations — through (a) the partial fused kernels
(ops/fused_block.py partial_out) and (b) the XLA ops the GSPMD TP path
runs per device, forward AND forward+backward, at the DINO train
geometry (global crops, ViT-B).

Enqueue-N + readback sync (the tunnel's block_until_ready returns at
enqueue)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tp", type=int, default=2)
    p.add_argument("--batch", type=int, default=4, help="global-crop B*2")
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--dispatches", type=int, default=8)
    p.add_argument("--only", default="",
                   help="run ONE variant (fused-fwd|fused-bwd|xla-fwd|"
                        "xla-bwd) — this chip's HBM is tight enough that "
                        "executables+buffers accumulated across variants "
                        "in one process crash the worker; a driver script "
                        "runs the four invocations separately")
    args = p.parse_args()

    from dino_video_summarization_transformer_tpu.utils.cache import (
        enable_compilation_cache)

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dino_video_summarization_transformer_tpu.models import timesformer as tsf
    from dino_video_summarization_transformer_tpu.ops import fused_block as fb

    D, H = 768, 12
    Hl = H // args.tp
    Dl = D * Hl // H
    hidden = 4 * D
    hl = hidden // args.tp
    B, T, N = args.batch, args.frames, 196

    rng = np.random.RandomState(0)
    f32 = jnp.float32

    def dev(*shape, scale=0.05):
        return jax.device_put(
            jnp.asarray(scale * rng.randn(*shape), f32))

    p_norm = {"scale": dev(D, scale=1.0), "bias": dev(D)}
    p_attn_l = {"qkv": {"kernel": dev(D, 3 * Dl), "bias": dev(3 * Dl)},
                "proj": {"kernel": dev(Dl, D), "bias": dev(D)}}
    p_fc = {"kernel": dev(D, D), "bias": dev(D)}
    p_mlp_l = {"fc1": {"kernel": dev(D, hl), "bias": dev(hl)},
               "fc2": {"kernel": dev(hl, D), "bias": dev(D)}}
    x = jax.device_put(jnp.asarray(
        rng.randn(B, T, N, D), jnp.bfloat16))
    cls = jax.device_put(jnp.asarray(rng.randn(B, 1, D), jnp.bfloat16))

    def shard_fused(pn, pa, pf, pm, cls, x):
        t = fb.fused_temporal_phase_tm(pn, pa, pf, x, Hl, partial_out=True)
        g, c = fb.fused_spatial_phase(pn, pa, cls, x, Hl, partial_out=True)
        m = fb.fused_mlp_phase(pn, pm, x, residual=False)
        return (jnp.sum(t.astype(f32)) + jnp.sum(g.astype(f32))
                + jnp.sum(c.astype(f32)) + jnp.sum(m.astype(f32)))

    def shard_xla(pn, pa, pf, pm, cls, x):
        # the per-device ops GSPMD runs on the TP path (XLA block): LN
        # replicated, local qkv/proj, local MLP halves; partials unreduced
        y = tsf.layer_norm(pn, x.reshape(B * T * N, D))
        qkv = tsf.linear(pa["qkv"], y).reshape(B, T, N, 3, Hl, 64)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        # temporal attention over T per location, local heads
        qt = q.transpose(0, 2, 3, 1, 4).reshape(B * N, Hl, T, 64)
        kt = k.transpose(0, 2, 3, 1, 4).reshape(B * N, Hl, T, 64)
        vt = v.transpose(0, 2, 3, 1, 4).reshape(B * N, Hl, T, 64)
        a = jax.nn.softmax(
            jnp.einsum("bhtd,bhsd->bhts", qt, kt) * 0.125, axis=-1)
        o = jnp.einsum("bhts,bhsd->bhtd", a, vt)
        o = o.transpose(0, 2, 1, 3).reshape(B * N * T, Dl)
        t_part = tsf.linear(pf, tsf.linear(pa["proj"], o))
        # spatial attention per frame (patches only, close-enough proxy)
        qs = q.reshape(B * T, N, Hl, 64).transpose(0, 2, 1, 3)
        ks = k.reshape(B * T, N, Hl, 64).transpose(0, 2, 1, 3)
        vs = v.reshape(B * T, N, Hl, 64).transpose(0, 2, 1, 3)
        a2 = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", qs, ks) * 0.125, axis=-1)
        o2 = jnp.einsum("bhnm,bhmd->bhnd", a2, vs)
        o2 = o2.transpose(0, 2, 1, 3).reshape(B * T * N, Dl)
        s_part = tsf.linear(pa["proj"], o2)
        # MLP halves
        m_part = tsf.linear(pm["fc2"], jax.nn.gelu(
            tsf.linear(pm["fc1"], y), approximate=False))
        return (jnp.sum(t_part.astype(f32)) + jnp.sum(s_part.astype(f32))
                + jnp.sum(m_part.astype(f32)))

    for name, fn in (("fused", shard_fused), ("xla", shard_xla)):
        fwd = jax.jit(fn)
        grad = jax.jit(jax.grad(fn, argnums=(1, 3)))
        for mode, g in (("fwd", fwd), ("fwd+bwd", grad)):
            tag = f"{name}-{'bwd' if 'bwd' in mode else 'fwd'}"
            if args.only and tag != args.only:
                continue
            out = g(p_norm, p_attn_l, p_fc, p_mlp_l, cls, x)
            np.asarray(jax.tree.leaves(out)[0])  # honest sync
            t0 = time.time()
            for _ in range(args.dispatches):
                out = g(p_norm, p_attn_l, p_fc, p_mlp_l, cls, x)
                # sync EVERY dispatch: queueing 8 un-synced grad programs
                # over-subscribes this chip's tight HBM (temp buffers per
                # in-flight program) and kills the worker — measured; the
                # per-readback tunnel latency (~40 ms) is included, so
                # rates are a lower bound
                np.asarray(jax.tree.leaves(out)[0])
            dt = (time.time() - t0) / args.dispatches * 1e3
            print(f"tp={args.tp} shard {name:5s} {mode:7s}: "
                  f"{dt:7.1f} ms/block-phase-set (per-dispatch sync)",
                  flush=True)


if __name__ == "__main__":
    main()
