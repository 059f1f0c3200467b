"""Head-sharded fused Pallas kernels under tensor parallelism.

The r4 train CLI forced the XLA block path whenever --model_parallel was
set — a ~2x step-MFU cliff (ops/fused_block.py kernels measured 80.9
TF/s vs ~46 XLA-remat; BENCH.md) — because the fused kernels ran
per-device full-width only.  This module runs them on HEAD SHARDS inside
a ``shard_map`` over the mesh's ``model`` axis:

* qkv is column-parallel and proj row-parallel (the same Megatron
  pairing parallel/tp.py annotates for the XLA path), so each shard's
  kernel computes ``fc(proj_l(attn(heads_l)))`` as an UNREDUCED partial
  (ops/fused_block.py ``partial_out``) with residuals and the
  once-applied biases added after one ``psum`` per phase half;
* the MLP needs no kernel change: fc1 is column-, fc2 row-parallel, and
  the existing ``residual=False`` path emits the partial (fc2 bias
  zeroed in, applied after the psum);
* GSPMD shards a (D, 3D) qkv kernel's last axis in CONTIGUOUS chunks
  ([all of q | half of k...] at tp=2), but the kernels slice q/k/v at
  fixed offsets of the LOCAL width — so the qkv columns are PERMUTED
  once at setup into head-major order ([q_l | k_l | v_l] per shard,
  ``permute_qkv_tree``; inverse provided for checkpoint export).

Gradient flow: the kernels' custom VJPs run per shard; shard_map's
transpose inserts the psum for the replicated activations and keeps the
weight grads sharded — equivalence with the XLA TP path is pinned by
tests/test_tp_fused.py on the virtual CPU mesh.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops import fused_block as fb
from .tp import tp_spec_tree


def qkv_head_perm(D: int, num_heads: int, tp: int) -> np.ndarray:
    """Column permutation taking a (D, 3D) qkv kernel from [q | k | v]
    (heads interleaved across shard chunks) to head-major shard order:
    chunk l holds [q_headsl | k_headsl | v_headsl]."""
    hd = D // num_heads
    Hl = num_heads // tp
    cols = np.arange(3 * D)
    t = cols // D
    rest = cols % D
    h = rest // hd
    o = rest % hd
    # lexsort: last key is primary
    return np.lexsort((o, h % Hl, t, h // Hl))


def _apply_qkv_perm(tree: Any, num_heads: int, tp: int,
                    inverse: bool = False) -> Any:
    """Permute every blocks.*.qkv kernel/bias into (or back from) the
    head-major TP layout. Leaves are block-stacked (L, D, 3D)/(L, 3D)."""

    def walk(t, in_qkv=False):
        if not isinstance(t, dict):
            return t
        out = {}
        for k, v in t.items():
            if isinstance(v, dict):
                out[k] = walk(v, in_qkv=(k == "qkv"))
            elif in_qkv and k in ("kernel", "bias"):
                D3 = v.shape[-1]
                perm = qkv_head_perm(D3 // 3, num_heads, tp)
                if inverse:
                    perm = np.argsort(perm)
                out[k] = jnp.take(v, jnp.asarray(perm), axis=-1)
            else:
                out[k] = v
        return out

    return walk(tree)


def permute_qkv_tree(params: Any, num_heads: int, tp: int) -> Any:
    return _apply_qkv_perm(params, num_heads, tp)


def unpermute_qkv_tree(params: Any, num_heads: int, tp: int) -> Any:
    """Inverse of permute_qkv_tree — apply before exporting a TP-fused
    checkpoint to the reference/interchange layout."""
    return _apply_qkv_perm(params, num_heads, tp, inverse=True)


def _zero_bias(like: jnp.ndarray) -> jnp.ndarray:
    return jnp.zeros((like.shape[-1],), like.dtype)


def tp_fused_divided_block(p, cls, grid_tm, num_heads_local: int,
                           axis: str):
    """One divided block inside the shard_map region: partial fused
    kernels per phase half, one psum each, residuals/biases applied once.
    Values == divided_block_fused on the unsharded params."""
    ps = jax.lax.psum

    # --- temporal half: x + fc(proj(attn(LN(x)))) -----------------------
    t_attn = p["temporal_attn"]
    bproj_t = t_attn["proj"]["bias"]
    wfc = p["temporal_fc"]["kernel"]
    bfc = p["temporal_fc"]["bias"]
    pa = {"qkv": t_attn["qkv"],
          "proj": {"kernel": t_attn["proj"]["kernel"],
                   "bias": _zero_bias(bproj_t)}}
    pf = {"kernel": wfc, "bias": _zero_bias(bfc)}
    part = fb.fused_temporal_phase_tm(
        p["temporal_norm1"], pa, pf, grid_tm, num_heads_local,
        partial_out=True)
    b_comb = (bproj_t.astype(jnp.float32) @ wfc.astype(jnp.float32)
              + bfc.astype(jnp.float32))
    grid_tm = grid_tm + (ps(part.astype(jnp.float32), axis)
                         + b_comb).astype(grid_tm.dtype)

    # --- spatial half ---------------------------------------------------
    s_attn = p["attn"]
    bproj_s = s_attn["proj"]["bias"]
    pa2 = {"qkv": s_attn["qkv"],
           "proj": {"kernel": s_attn["proj"]["kernel"],
                    "bias": _zero_bias(bproj_s)}}
    g_part, c_part = fb.fused_spatial_phase(
        p["norm1"], pa2, cls, grid_tm, num_heads_local, partial_out=True)
    g_full = ps(g_part.astype(jnp.float32), axis) + bproj_s
    c_full = ps(c_part.astype(jnp.float32), axis) + bproj_s
    grid_tm = grid_tm + g_full.astype(grid_tm.dtype)
    cls = cls + c_full.mean(axis=1, keepdims=True).astype(cls.dtype)

    # --- MLP (no kernel change: fc1 col-, fc2 row-parallel) -------------
    b2 = p["mlp"]["fc2"]["bias"]
    pm = {"fc1": p["mlp"]["fc1"],
          "fc2": {"kernel": p["mlp"]["fc2"]["kernel"],
                  "bias": _zero_bias(b2)}}
    m_g = fb.fused_mlp_phase(p["norm2"], pm, grid_tm, residual=False)
    m_c = fb.fused_mlp_phase(p["norm2"], pm, cls, residual=False)
    grid_tm = grid_tm + (ps(m_g.astype(jnp.float32), axis)
                         + b2).astype(grid_tm.dtype)
    cls = cls + (ps(m_c.astype(jnp.float32), axis) + b2).astype(cls.dtype)
    return cls, grid_tm


def tp_fused_forward_features(params: Any, x: jnp.ndarray, cfg,
                              mesh: Mesh, axis: str = "model",
                              data_axis: str = "data",
                              compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """TP twin of the glue-free fused forward (models/timesformer.py
    forward_features): replicated embedding, block stack under shard_map
    with head-sharded fused kernels, replicated final LN. Params must be
    qkv-PERMUTED (permute_qkv_tree) and sharded per parallel/tp.py.

    Returns (B, D) CLS features; differentiable (the custom-VJP kernels
    run per shard)."""
    from ..models.timesformer import (interp_nearest_1d, layer_norm,
                                      patch_embed, resize_pos_embed)

    tp = mesh.shape[axis]
    Hl = cfg.num_heads // tp
    assert cfg.num_heads % tp == 0, (cfg.num_heads, tp)
    assert cfg.attention_type == "divided_space_time"

    B, C, T, Himg, Wimg = x.shape
    ps_ = cfg.patch_size
    W = Wimg // ps_
    N = (Himg // ps_) * W
    D = cfg.embed_dim

    x = x.astype(compute_dtype)
    frames = x.transpose(0, 2, 3, 4, 1).reshape(B * T, Himg, Wimg, C)
    tok = patch_embed(params["patch_embed"], frames, ps_)
    cls = jnp.broadcast_to(
        params["cls_token"].astype(compute_dtype), (B * T, 1, D))
    xt = jnp.concatenate([cls, tok], axis=1)
    pe = params["pos_embed"]
    if xt.shape[1] != pe.shape[1]:
        pe = resize_pos_embed(pe, xt.shape[1], W)
    xt = xt + pe.astype(compute_dtype)

    cls_tok = xt[:B, :1, :]
    spat_tm = xt[:, 1:, :].reshape(B, T, N, D)
    te = params["time_embed"]
    if T != te.shape[1]:
        te = interp_nearest_1d(te, T, axis=1)
    spat_tm = spat_tm + te.astype(compute_dtype)[:, :, None, :]

    blocks = params["blocks"]
    specs_b = tp_spec_tree(blocks, mesh, axis)
    # all-manual shard_map: the batch rides the data axis explicitly
    # (blocks are embarrassingly parallel over it — no data collectives),
    # activations are replicated over the model axis, weights sharded per
    # parallel/tp.py. check_vma=False: pallas_call outputs carry no
    # varying-mesh-axis type, which the VMA checker would reject.
    if data_axis in mesh.shape and B % mesh.shape[data_axis] == 0:
        act_spec = P(data_axis)
    else:  # pure-TP mesh, or a batch the data axis does not divide
        act_spec = P()

    def region(blocks_l, cls, grid):
        def body(carry, bp):
            return tp_fused_divided_block(bp, carry[0], carry[1], Hl,
                                          axis), None

        (cls, grid), _ = jax.lax.scan(body, (cls, grid), blocks_l)
        return cls, grid

    try:
        sm = shard_map(region, mesh=mesh,
                       in_specs=(specs_b, act_spec, act_spec),
                       out_specs=(act_spec, act_spec), check_vma=False)
    except TypeError:  # pragma: no cover - older jax
        sm = shard_map(region, mesh=mesh,
                       in_specs=(specs_b, act_spec, act_spec),
                       out_specs=(act_spec, act_spec))
    cls_tok, _ = sm(blocks, cls_tok, spat_tm)
    return layer_norm(params["norm"], cls_tok, eps=cfg.norm_eps)[:, 0]
