"""Synthetic video corpus with natural-video dynamics, for quality
validation of the fast scoring modes (tools/validate_fast_scoring.py,
tests/test_fast_scoring.py).

Design: scene segments separated by hard cuts, slowly panning smoothed
textures (~1 px/frame — matching real footage pre-sampled at rate 4), and
sparse 3-frame bright "events" a summarizer should find. Near-Nyquist
content (feature period ~= the teacher stride) would be adversarial and
unrepresentative of real video; hard cuts ARE the realistic worst case for
teacher-feature interpolation and are included.
"""

from __future__ import annotations

import numpy as np


def make_numpy_params(cfg, seed: int = 0):
    """Deterministic TimeSformer params drawn from numpy (RandomState is
    bit-stable forever, unlike jax.random across jax versions) — the basis
    of the committed golden score artifact (tests/test_golden_scores.py):
    a numerics regression must come from the SCORING MATH, never from an
    RNG stream change. Mirrors init_timesformer's pytree structure."""
    import jax.numpy as jnp

    r = np.random.RandomState(seed)
    D, L = cfg.embed_dim, cfg.depth
    Dh = int(D * cfg.mlp_ratio)

    def lin(fi, fo, std=0.02):
        return {"kernel": jnp.asarray(r.randn(fi, fo) * std, jnp.float32),
                "bias": jnp.asarray(r.randn(fo) * 0.01, jnp.float32)}

    def ln():
        return {"scale": jnp.asarray(1 + 0.05 * r.randn(D), jnp.float32),
                "bias": jnp.asarray(0.02 * r.randn(D), jnp.float32)}

    def stack(ps):
        import jax
        return jax.tree.map(lambda *a: jnp.stack(a), *ps)

    blocks = stack([{
        "norm1": ln(),
        "attn": {"qkv": lin(D, 3 * D), "proj": lin(D, D)},
        "norm2": ln(),
        "mlp": {"fc1": lin(D, Dh), "fc2": lin(Dh, D)},
        "temporal_norm1": ln(),
        "temporal_attn": {"qkv": lin(D, 3 * D), "proj": lin(D, D)},
        "temporal_fc": lin(D, D),
    } for _ in range(L)])
    return {
        "cls_token": jnp.asarray(r.randn(1, 1, D) * 0.02, jnp.float32),
        "pos_embed": jnp.asarray(
            r.randn(1, cfg.num_patches + 1, D) * 0.02, jnp.float32),
        "patch_embed": {
            "proj": lin(cfg.patch_size * cfg.patch_size * cfg.in_chans, D)},
        "blocks": blocks,
        "norm": ln(),
        "time_embed": jnp.asarray(
            r.randn(1, cfg.num_frames, D) * 0.02, jnp.float32),
    }


def make_video(seed: int, T: int, size: int, events: bool = True) -> np.ndarray:
    r = np.random.RandomState(seed)
    big = r.rand(size * 3, size * 3, 3).astype(np.float32)
    for _ in range(3):  # smooth the texture
        big = 0.25 * (np.roll(big, 1, 0) + np.roll(big, -1, 0)
                      + np.roll(big, 1, 1) + np.roll(big, -1, 1))
    vid = np.zeros((T, size, size, 3), np.float32)
    t0 = 0
    while t0 < T:
        seg = min(T - t0, r.randint(50, 90))
        x0, y0 = r.randint(0, size * 2, 2)
        vx, vy = r.uniform(-1.2, 1.2, 2)
        tex = np.roll(big, r.randint(0, 999), axis=r.randint(0, 2))
        for i in range(seg):
            xx = int(np.clip(x0 + vx * i, 0, size * 2 - 1))
            yy = int(np.clip(y0 + vy * i, 0, size * 2 - 1))
            vid[t0 + i] = tex[yy:yy + size, xx:xx + size]
        t0 += seg
    if events:
        for e in r.choice(T - 4, max(2, T // 60), replace=False):
            x0, y0 = r.randint(0, size - size // 4, 2)
            s = size // 4
            vid[e:e + 3, y0:y0 + s, x0:x0 + s] += 0.8
    vid += 0.03 * r.randn(T, size, size, 3).astype(np.float32)
    return (np.clip(vid, 0, 1) * 255).astype(np.uint8)
