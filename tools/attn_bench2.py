#!/usr/bin/env python
"""Round 2 of attention-variant timing: tile-alignment hypotheses.

Tests whether MXU tile alignment (L padded to 128/256, masked softmax)
recovers the utilization that the L=197 / L=30 geometries lose."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])


def bench(op, q, k, v, iters=20, repeats=3):
    @jax.jit
    def run(q, k, v):
        def body(i, q):
            out = op(q, k, v)
            return q + out.astype(q.dtype) * 1e-12
        return jax.lax.fori_loop(0, iters, body, q)

    _force(run(q, k, v))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _force(run(q, k, v))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def xla_attn(q, k, v):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bnd,bmd->bnm", q, k) * scale
    s = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bnm,bmd->bnd", s, v)


def xla_attn_padded(q, k, v, Lpad):
    """Pad the KEY/VALUE length to a tile multiple; queries stay L (extra
    keys masked). Also pad queries: full Lpad x Lpad scores."""
    BH, L, hd = q.shape
    scale = hd ** -0.5
    pad = Lpad - L
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    s = jnp.einsum("bnd,bmd->bnm", qp, kp) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, (Lpad, Lpad), 1)
    s = jnp.where(col < L, s, jnp.asarray(-jnp.inf, s.dtype))
    s = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bnm,bmd->bnd", s, vp)
    return out[:, :L]


def xla_attn_f32(q, k, v):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bnd,bmd->bnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    s = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bnm,bmd->bnd", s, v)


def xla_attn_packed(q, k, v, G, mask_val=-jnp.inf):
    BH, L, hd = q.shape
    scale = hd ** -0.5
    qp = q.reshape(BH // G, G * L, hd)
    kp = k.reshape(BH // G, G * L, hd)
    vp = v.reshape(BH // G, G * L, hd)
    s = jnp.einsum("bnd,bmd->bnm", qp, kp) * scale
    seq_r = jax.lax.broadcasted_iota(jnp.int32, (G * L, G * L), 0) // L
    seq_c = jax.lax.broadcasted_iota(jnp.int32, (G * L, G * L), 1) // L
    s = jnp.where(seq_r == seq_c, s, jnp.asarray(mask_val, s.dtype))
    s = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bnm,bmd->bnd", s, vp)
    return out.reshape(BH, L, hd)


def main():
    B, H, hd = 32, 12, 64

    for name, nseq, L in [("temporal", B * 196, 30),
                          ("spatial", B * 30, 197)]:
        BH = nseq * H
        mk = lambda s: jax.jit(lambda: jax.random.normal(
            jax.random.key(s), (BH, L, hd), jnp.bfloat16))()
        q, k, v = mk(0), mk(1), mk(2)
        _force(q), _force(k), _force(v)
        flops = 4 * BH * L * L * hd

        def row(tag, secs):
            print(f"{name} {tag:22s} {secs * 1e3:8.2f} ms "
                  f"{flops / secs / 1e12:7.2f} TFLOP/s", flush=True)

        row("XLA einsum", bench(xla_attn, q, k, v))
        row("XLA f32 scores", bench(xla_attn_f32, q, k, v))
        if L == 30:
            for G in (4, 8):
                try:
                    row(f"XLA packed G={G}",
                        bench(partial(xla_attn_packed, G=G), q, k, v))
                except Exception as e:
                    print(f"{name} packed G={G} failed: {e}")
            row("XLA padded L=128",
                bench(partial(xla_attn_padded, Lpad=128), q, k, v))
        else:
            row("XLA padded L=256",
                bench(partial(xla_attn_padded, Lpad=256), q, k, v))


if __name__ == "__main__":
    main()
