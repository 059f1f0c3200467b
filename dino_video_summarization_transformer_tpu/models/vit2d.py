"""2D Vision Transformer (DINO image path), TPU-native.

Re-design of the reference's timm-style 2D ViT
(ref: vision_transformer.py:100-245): standard pre-norm blocks under
lax.scan, patchify-matmul embedding, and DINO's bicubic positional-embedding
interpolation with the +0.1 scale-factor epsilon quirk
(ref: vision_transformer.py:174-198). Used by the image-domain DINO
training path (``train_ssl.py`` --arch vit_* with 2D inputs) and the
2D feature-extraction protocols.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

from .timesformer import (
    _linear_init,
    _ln_init,
    _trunc_normal,
    layer_norm,
    linear,
    mhsa,
    mlp,
    _drop_path,
)


@dataclasses.dataclass(frozen=True)
class ViT2DConfig:
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    num_classes: int = 0
    drop_path_rate: float = 0.0
    norm_eps: float = 1e-6

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2


def vit2d_tiny(**kw):
    return ViT2DConfig(embed_dim=192, depth=12, num_heads=3, **kw)


def vit2d_small(**kw):
    return ViT2DConfig(embed_dim=384, depth=12, num_heads=6, **kw)


def vit2d_base(**kw):
    return ViT2DConfig(embed_dim=768, depth=12, num_heads=12, **kw)


def init_vit2d(rng: jax.Array, cfg: ViT2DConfig) -> Any:
    D, L = cfg.embed_dim, cfg.depth
    keys = jax.random.split(rng, 6)

    def block_init(key):
        ks = jax.random.split(key, 4)
        return {
            "norm1": _ln_init(D),
            "attn": {
                "qkv": _linear_init(ks[0], D, 3 * D, bias=cfg.qkv_bias),
                "proj": _linear_init(ks[1], D, D),
            },
            "norm2": _ln_init(D),
            "mlp": {
                "fc1": _linear_init(ks[2], D, int(D * cfg.mlp_ratio)),
                "fc2": _linear_init(ks[3], int(D * cfg.mlp_ratio), D),
            },
        }

    blocks = jax.vmap(block_init)(jax.random.split(keys[0], L))
    params = {
        "cls_token": _trunc_normal(keys[1], (1, 1, D)),
        "pos_embed": _trunc_normal(keys[2], (1, cfg.num_patches + 1, D)),
        "patch_embed": {
            "proj": _linear_init(keys[3], cfg.patch_size ** 2 * cfg.in_chans, D)
        },
        "blocks": blocks,
        "norm": _ln_init(D),
    }
    if cfg.num_classes > 0:
        params["head"] = _linear_init(keys[4], D, cfg.num_classes)
    return params


def _bicubic_resize_2d(grid: jnp.ndarray, out_h: int, out_w: int,
                       scale_h: float | None = None,
                       scale_w: float | None = None) -> jnp.ndarray:
    """torch F.interpolate bicubic (align_corners=False) on (H, W, D).

    When torch is called with ``scale_factor`` (as DINO's pos-embed interp
    is), the coordinate mapping uses the PROVIDED factor — not out/in — so
    the +0.1 epsilon leaks into sampling positions; scale_h/scale_w carry it.
    """

    def coords(out_len, in_len, scale_override):
        scale = (1.0 / scale_override) if scale_override else in_len / out_len
        src = (jnp.arange(out_len) + 0.5) * scale - 0.5
        i0 = jnp.floor(src).astype(jnp.int32)
        frac = src - i0
        idx = jnp.stack([i0 - 1, i0, i0 + 1, i0 + 2], axis=1)
        d = jnp.stack([frac + 1, frac, 1 - frac, 2 - frac], axis=1)
        a = -0.75
        ad = jnp.abs(d)
        w = jnp.where(
            ad <= 1, (a + 2) * ad ** 3 - (a + 3) * ad ** 2 + 1,
            jnp.where(ad < 2, a * ad ** 3 - 5 * a * ad ** 2 + 8 * a * ad - 4 * a, 0.0))
        return jnp.clip(idx, 0, in_len - 1), w

    yi, yw = coords(out_h, grid.shape[0], scale_h)
    xi, xw = coords(out_w, grid.shape[1], scale_w)
    rows = (grid[yi, :, :] * yw[:, :, None, None]).sum(axis=1)  # (out_h, W, D)
    cols = (rows[:, xi, :] * xw[None, :, :, None]).sum(axis=2)  # (out_h, out_w, D)
    return cols


def interpolate_pos_encoding(pos_embed: jnp.ndarray, npatch: int, w: int, h: int,
                             patch_size: int) -> jnp.ndarray:
    """DINO bicubic pos-embed interpolation with the +0.1 epsilon trick
    (ref: vision_transformer.py:174-198). Output grid size int(w0+0.1) etc.
    matches torch's scale_factor rounding."""
    N = pos_embed.shape[1] - 1
    if npatch == N and w == h:
        return pos_embed
    cls_pe = pos_embed[:, :1]
    patch_pe = pos_embed[0, 1:]
    dim = pos_embed.shape[-1]
    side = int(math.isqrt(N))
    w0 = w // patch_size
    h0 = h // patch_size
    # torch computes output size as floor(in * scale_factor) with the +0.1
    out_w = int(side * ((w0 + 0.1) / side))
    out_h = int(side * ((h0 + 0.1) / side))
    grid = patch_pe.reshape(side, side, dim)
    # torch layout: (1, dim, side, side) scaled by (w0/s, h0/s) -> first
    # spatial dim scales by w0, second by h0
    resized = _bicubic_resize_2d(
        grid, out_w, out_h,
        scale_h=(w0 + 0.1) / side, scale_w=(h0 + 0.1) / side)
    return jnp.concatenate([cls_pe, resized.reshape(1, -1, dim)], axis=1)


def prepare_tokens(params, x: jnp.ndarray, cfg: ViT2DConfig) -> jnp.ndarray:
    """(ref: vision_transformer.py:200-210). x (B, C, H, W)."""
    B, C, H, W = x.shape
    ps = cfg.patch_size
    gh, gw = H // ps, W // ps
    xhw = x.transpose(0, 2, 3, 1)
    patches = xhw.reshape(B, gh, ps, gw, ps, C).transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(B, gh * gw, ps * ps * C)
    tok = linear(params["patch_embed"]["proj"], patches)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (B, 1, cfg.embed_dim))
    out = jnp.concatenate([cls, tok], axis=1)
    pe = interpolate_pos_encoding(
        params["pos_embed"], gh * gw, H, W, ps).astype(x.dtype)
    return out + pe


def forward(params, x: jnp.ndarray, cfg: ViT2DConfig, *,
            use_head: bool = False, train: bool = False,
            rng: Optional[jax.Array] = None,
            compute_dtype=jnp.float32) -> jnp.ndarray:
    """(ref: vision_transformer.py:212-217) — returns CLS features."""
    x = prepare_tokens(params, x.astype(compute_dtype), cfg)

    dpr = jnp.linspace(0.0, cfg.drop_path_rate, cfg.depth)
    use_dp = train and cfg.drop_path_rate > 0.0 and rng is not None
    rngs = (jax.random.split(rng, cfg.depth) if use_dp
            else jnp.zeros((cfg.depth, 2), jnp.uint32))

    def body(carry, scanned):
        bp, rate, brng = scanned
        y = carry + _maybe_dp(
            mhsa(bp["attn"], layer_norm(bp["norm1"], carry), cfg.num_heads),
            rate, brng, use_dp)
        y = y + _maybe_dp(
            mlp(bp["mlp"], layer_norm(bp["norm2"], y)), rate, brng, use_dp)
        return y, None

    x, _ = jax.lax.scan(body, x, (params["blocks"], dpr, rngs))
    x = layer_norm(params["norm"], x, eps=cfg.norm_eps)
    feats = x[:, 0]
    if use_head and "head" in params:
        feats = linear(params["head"], feats)
    return feats


def _maybe_dp(y, rate, rng, use_dp):
    if not use_dp:
        return y
    return _drop_path(rng, y, rate)


def vit2d_to_pytree(sd, cfg: ViT2DConfig):
    """torch state_dict (vision_transformer.py layout) -> pytree; reuses the
    TimeSformer converter's linear/ln mapping."""
    import numpy as np

    from .convert import _BLOCK_RE, _linear_to_jax, _ln_to_jax

    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    block_sd = {}
    for k, v in sd.items():
        m = _BLOCK_RE.match(k)
        if m:
            block_sd.setdefault(int(m.group(1)), {})[m.group(2)] = v
    assert len(block_sd) == cfg.depth

    def stacked(fn):
        per = [fn(block_sd[i]) for i in range(cfg.depth)]
        return jax.tree.map(lambda *xs: np.stack(xs), *per)

    blocks = {
        "norm1": stacked(lambda b: _ln_to_jax(b, "norm1")),
        "attn": stacked(lambda b: {
            "qkv": _linear_to_jax(b, "attn.qkv"),
            "proj": _linear_to_jax(b, "attn.proj"),
        }),
        "norm2": stacked(lambda b: _ln_to_jax(b, "norm2")),
        "mlp": stacked(lambda b: {
            "fc1": _linear_to_jax(b, "mlp.fc1"),
            "fc2": _linear_to_jax(b, "mlp.fc2"),
        }),
    }
    w = sd["patch_embed.proj.weight"]
    D, C, ps, _ = w.shape
    params = {
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "patch_embed": {"proj": {
            "kernel": w.transpose(2, 3, 1, 0).reshape(ps * ps * C, D),
            "bias": sd["patch_embed.proj.bias"]}},
        "blocks": blocks,
        "norm": _ln_to_jax(sd, "norm"),
    }
    if "head.weight" in sd:
        params["head"] = _linear_to_jax(sd, "head")
    return params
