"""Video Swin Transformer 3D, TPU-native (ref: models/swin_transformer.py:39-687).

Selectable via ``--arch swin`` in the SSL trainer / linear probe
(ref: train_ssl.py:237-246, eval_linear.py:93-95). Functional JAX:
shifted-window attention with relative position bias, hierarchical
patch-merging stages, cyclic shifts via jnp.roll, and the reference's
adaptive window shrinking for small inputs. Window geometry is static under
jit (input sizes are static), so masks and relative-position indices are
precomputed host-side as numpy constants.
"""

from __future__ import annotations

import dataclasses
import itertools
from functools import lru_cache, reduce
from operator import mul
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .timesformer import _linear_init, _ln_init, layer_norm, linear, mlp


@dataclasses.dataclass(frozen=True)
class Swin3DConfig:
    patch_size: Tuple[int, int, int] = (4, 4, 4)
    in_chans: int = 3
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: Tuple[int, int, int] = (2, 7, 7)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    patch_norm: bool = False
    norm_eps: float = 1e-5  # torch nn.LayerNorm default

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))


def get_window_size(x_size, window_size, shift_size=None):
    """Shrink windows that exceed the input (ref: swin_transformer.py:71-84)."""
    use_ws = list(window_size)
    use_ss = list(shift_size) if shift_size is not None else None
    for i in range(len(x_size)):
        if x_size[i] <= window_size[i]:
            use_ws[i] = x_size[i]
            if use_ss is not None:
                use_ss[i] = 0
    if shift_size is None:
        return tuple(use_ws)
    return tuple(use_ws), tuple(use_ss)


def window_partition(x: jnp.ndarray, ws) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B*nW, prod(ws), C) (ref: swin_transformer.py:39-51)."""
    B, D, H, W, C = x.shape
    x = x.reshape(B, D // ws[0], ws[0], H // ws[1], ws[1], W // ws[2], ws[2], C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, reduce(mul, ws), C)


def window_reverse(windows: jnp.ndarray, ws, B, D, H, W) -> jnp.ndarray:
    """(ref: swin_transformer.py:54-68)."""
    x = windows.reshape(B, D // ws[0], H // ws[1], W // ws[2], ws[0], ws[1], ws[2], -1)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, D, H, W, -1)


@lru_cache(maxsize=64)
def relative_position_index(ws: Tuple[int, int, int]) -> np.ndarray:
    """(ref: swin_transformer.py:113-129)."""
    coords = np.stack(np.meshgrid(
        np.arange(ws[0]), np.arange(ws[1]), np.arange(ws[2]), indexing="ij"))
    flat = coords.reshape(3, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws[0] - 1
    rel[:, :, 1] += ws[1] - 1
    rel[:, :, 2] += ws[2] - 1
    rel[:, :, 0] *= (2 * ws[1] - 1) * (2 * ws[2] - 1)
    rel[:, :, 1] *= 2 * ws[2] - 1
    return rel.sum(-1)


@lru_cache(maxsize=64)
def compute_mask(Dp, Hp, Wp, ws, ss) -> Optional[np.ndarray]:
    """Shifted-window attention mask (ref: swin_transformer.py:319-333)."""
    img_mask = np.zeros((1, Dp, Hp, Wp, 1), np.float32)
    cnt = 0
    # slice construction kept verbatim (incl. the ss==0 -0 quirks) so the
    # mask bit-matches the reference (ref: swin_transformer.py:321-328)
    for d in (slice(-ws[0]), slice(-ws[0], -ss[0]), slice(-ss[0], None)):
        for h in (slice(-ws[1]), slice(-ws[1], -ss[1]), slice(-ss[1], None)):
            for w in (slice(-ws[2]), slice(-ws[2], -ss[2]), slice(-ss[2], None)):
                img_mask[:, d, h, w, :] = cnt
                cnt += 1
    mw = np.asarray(window_partition(jnp.asarray(img_mask), ws))[..., 0]
    attn_mask = mw[:, None, :] - mw[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


def window_attention(p, x, ws, num_heads, mask: Optional[np.ndarray]):
    """(ref: swin_transformer.py:139-172). x (B_, N, C)."""
    B_, N, C = x.shape
    H = num_heads
    hd = C // H
    qkv = linear(p["qkv"], x).reshape(B_, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = jnp.einsum("bhnd,bhmd->bhnm", q * (hd ** -0.5), k,
                      preferred_element_type=jnp.float32)
    idx = relative_position_index(ws)[:N, :N].reshape(-1)
    bias = p["relative_position_bias_table"][idx].reshape(N, N, H)
    attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(B_ // nW, nW, H, N, N) + jnp.asarray(
            mask, attn.dtype)[None, :, None]
        attn = attn.reshape(B_, H, N, N)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
    return linear(p["proj"], out)


def swin_block(p, x, ws_cfg, ss_cfg, num_heads, norm_eps):
    """(ref: swin_transformer.py:231-268). x (B, D, H, W, C)."""
    B, D, H, W, C = x.shape
    ws, ss = get_window_size((D, H, W), ws_cfg, ss_cfg)

    shortcut = x
    x = layer_norm(p["norm1"], x, eps=norm_eps)
    pads = [(0, (ws[0] - D % ws[0]) % ws[0]),
            (0, (ws[1] - H % ws[1]) % ws[1]),
            (0, (ws[2] - W % ws[2]) % ws[2])]
    x = jnp.pad(x, ((0, 0), pads[0], pads[1], pads[2], (0, 0)))
    _, Dp, Hp, Wp, _ = x.shape
    if any(s > 0 for s in ss):
        x = jnp.roll(x, shift=(-ss[0], -ss[1], -ss[2]), axis=(1, 2, 3))
        mask = compute_mask(Dp, Hp, Wp, ws, ss)
    else:
        mask = None
    xw = window_partition(x, ws)
    aw = window_attention(p["attn"], xw, ws, num_heads, mask)
    x = window_reverse(aw, ws, B, Dp, Hp, Wp)
    if any(s > 0 for s in ss):
        x = jnp.roll(x, shift=ss, axis=(1, 2, 3))
    x = x[:, :D, :H, :W, :]
    x = shortcut + x
    return x + mlp(p["mlp"], layer_norm(p["norm2"], x))


def patch_merging(p, x, norm_eps):
    """(ref: swin_transformer.py:287-315). x (B, D, H, W, C)."""
    B, D, H, W, C = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, H % 2), (0, W % 2), (0, 0)))
    x0 = x[:, :, 0::2, 0::2, :]
    x1 = x[:, :, 1::2, 0::2, :]
    x2 = x[:, :, 0::2, 1::2, :]
    x3 = x[:, :, 1::2, 1::2, :]
    x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
    x = layer_norm(p["norm"], x, eps=norm_eps)
    return linear(p["reduction"], x)


def init_swin3d(rng: jax.Array, cfg: Swin3DConfig) -> Any:
    keys = iter(jax.random.split(rng, 256))
    D = cfg.embed_dim
    pt, ph, pw = cfg.patch_size
    params: Any = {
        "patch_embed": {
            "proj": _linear_init(next(keys), pt * ph * pw * cfg.in_chans, D)
        },
        "layers": [],
    }
    if cfg.patch_norm:
        params["patch_embed"]["norm"] = _ln_init(D)
    ws = cfg.window_size
    n_bias = (2 * ws[0] - 1) * (2 * ws[1] - 1) * (2 * ws[2] - 1)
    for i, depth in enumerate(cfg.depths):
        dim = int(D * 2 ** i)
        layer = {"blocks": []}
        for _ in range(depth):
            layer["blocks"].append({
                "norm1": _ln_init(dim),
                "attn": {
                    "qkv": _linear_init(next(keys), dim, 3 * dim, bias=cfg.qkv_bias),
                    "proj": _linear_init(next(keys), dim, dim),
                    "relative_position_bias_table": 0.02 * jax.random.truncated_normal(
                        next(keys), -2, 2, (n_bias, cfg.num_heads[i])),
                },
                "norm2": _ln_init(dim),
                "mlp": {
                    "fc1": _linear_init(next(keys), dim, int(dim * cfg.mlp_ratio)),
                    "fc2": _linear_init(next(keys), int(dim * cfg.mlp_ratio), dim),
                },
            })
        if i < len(cfg.depths) - 1:
            layer["downsample"] = {
                "norm": _ln_init(4 * dim),
                "reduction": _linear_init(next(keys), 4 * dim, 2 * dim, bias=False),
            }
        params["layers"].append(layer)
    params["norm"] = _ln_init(cfg.num_features)
    return params


def forward(params, x: jnp.ndarray, cfg: Swin3DConfig, *,
            compute_dtype=jnp.float32) -> jnp.ndarray:
    """(ref: swin_transformer.py:668-681). x (B, C, T, H, W) -> (B, num_features)."""
    x = x.astype(compute_dtype)
    B, C, D, H, W = x.shape
    pt, ph, pw = cfg.patch_size
    # pad to patch multiples (ref: swin_transformer.py:448-456)
    pd = (pt - D % pt) % pt
    phh = (ph - H % ph) % ph
    pww = (pw - W % pw) % pw
    x = jnp.pad(x, ((0, 0), (0, 0), (0, pd), (0, phh), (0, pww)))
    B, C, D, H, W = x.shape
    # patchify conv3d stride=kernel == matmul
    x = x.transpose(0, 2, 3, 4, 1)  # B D H W C
    x = x.reshape(B, D // pt, pt, H // ph, ph, W // pw, pw, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        B, D // pt, H // ph, W // pw, pt * ph * pw * C)
    x = linear(params["patch_embed"]["proj"], x)
    if "norm" in params["patch_embed"]:
        x = layer_norm(params["patch_embed"]["norm"], x, eps=cfg.norm_eps)

    for i, layer in enumerate(params["layers"]):
        ss = tuple(w // 2 for w in cfg.window_size)
        for bi, bp in enumerate(layer["blocks"]):
            block_ss = (0, 0, 0) if bi % 2 == 0 else ss
            x = swin_block(bp, x, cfg.window_size, block_ss,
                           cfg.num_heads[i], cfg.norm_eps)
        if "downsample" in layer:
            x = patch_merging(layer["downsample"], x, cfg.norm_eps)

    x = layer_norm(params["norm"], x, eps=cfg.norm_eps)
    return x.mean(axis=(1, 2, 3))  # AdaptiveAvgPool3d(1) + squeeze


def inflate_2d_state_dict(sd, cfg: Swin3DConfig) -> dict:
    """2D Swin -> 3D inflation (ref: swin_transformer.py:569-630):
    patch-embed kernel repeated over the temporal axis and divided by its
    length; relative position bias tables bicubic-resized spatially (if
    needed) then tiled 2*Wd-1 times over the temporal offset axis."""
    from .vit2d import _bicubic_resize_2d

    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()
          if "relative_position_index" not in k and "attn_mask" not in k}
    pt = cfg.patch_size[0]
    w2 = sd["patch_embed.proj.weight"]  # (E, C, ph, pw)
    sd["patch_embed.proj.weight"] = (
        np.repeat(w2[:, :, None], pt, axis=2) / pt)

    wd, wh, ww = cfg.window_size
    L2 = (2 * wh - 1) * (2 * ww - 1)
    for k in [k for k in sd if "relative_position_bias_table" in k]:
        table = sd[k]  # (L1, nH)
        L1, nH = table.shape
        if L1 != L2:
            S1 = int(L1 ** 0.5)
            grid = table.reshape(S1, S1, nH)
            resized = np.asarray(_bicubic_resize_2d(
                jnp.asarray(grid), 2 * wh - 1, 2 * ww - 1))
            table = resized.reshape(L2, nH)
        sd[k] = np.tile(table, (2 * wd - 1, 1))
    return sd


def swin3d_to_pytree(sd, cfg: Swin3DConfig) -> Any:
    """torch state_dict -> pytree (ref layout: patch_embed.proj Conv3d,
    layers.{i}.blocks.{j}.*, layers.{i}.downsample.*)."""
    from .convert import _linear_to_jax, _ln_to_jax

    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    w = sd["patch_embed.proj.weight"]  # (E, C, pt, ph, pw)
    E, C, pt, ph, pw = w.shape
    params: Any = {
        "patch_embed": {"proj": {
            "kernel": w.transpose(2, 3, 4, 1, 0).reshape(pt * ph * pw * C, E),
            "bias": sd["patch_embed.proj.bias"]}},
        "layers": [],
    }
    if "patch_embed.norm.weight" in sd:
        params["patch_embed"]["norm"] = _ln_to_jax(sd, "patch_embed.norm")
    for i, depth in enumerate(cfg.depths):
        layer: Any = {"blocks": []}
        for j in range(depth):
            pre = f"layers.{i}.blocks.{j}"
            layer["blocks"].append({
                "norm1": _ln_to_jax(sd, f"{pre}.norm1"),
                "attn": {
                    "qkv": _linear_to_jax(sd, f"{pre}.attn.qkv"),
                    "proj": _linear_to_jax(sd, f"{pre}.attn.proj"),
                    "relative_position_bias_table":
                        sd[f"{pre}.attn.relative_position_bias_table"],
                },
                "norm2": _ln_to_jax(sd, f"{pre}.norm2"),
                "mlp": {
                    "fc1": _linear_to_jax(sd, f"{pre}.mlp.fc1"),
                    "fc2": _linear_to_jax(sd, f"{pre}.mlp.fc2"),
                },
            })
        if f"layers.{i}.downsample.norm.weight" in sd:
            layer["downsample"] = {
                "norm": _ln_to_jax(sd, f"layers.{i}.downsample.norm"),
                "reduction": _linear_to_jax(sd, f"layers.{i}.downsample.reduction"),
            }
        params["layers"].append(layer)
    params["norm"] = _ln_to_jax(sd, "norm")
    return params
