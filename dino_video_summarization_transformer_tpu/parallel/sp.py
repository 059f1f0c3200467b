"""Sequence parallelism (Ulysses-style) for divided space-time attention.

The reference has no sequence/context parallelism (SURVEY.md section 5 —
long videos are handled algorithmically). This module adds the TPU-native
version for when one clip's token grid outgrows a chip (high resolution /
long T): divided attention factorizes the sequence, and each factor is
embarrassingly parallel along the OTHER factor's axis —

* temporal attention (over T, per spatial position) is fully local when
  the grid is sharded over positions N;
* spatial attention (over 1+N, per frame) is fully local when the grid is
  sharded over frames T.

So one block needs exactly two ``all_to_all`` reshards (N-sharded <->
T-sharded, each moving 1/S of the grid per device over ICI) plus one
``psum`` of the (B, D) CLS row — the divided-attention analogue of
DeepSpeed-Ulysses' head/sequence all-to-all, but without touching the head
dimension at all. The CLS row and all weights are replicated; LayerNorm /
MLP / projections are position-wise and run local under either sharding.

Values equal the single-device ``forward_features`` (the per-frame CLS
average becomes a local sum + psum, same ops per element); equivalence and
gradients are pinned by tests/test_pipeline.py's sibling
tests/test_seq_parallel.py on the 8-virtual-device CPU mesh.

Divisibility: N % S == 0 and T % S == 0 (assert-checked). The scoring
teacher geometry (T=30, N=196) admits S=2; training clips (T=8, N=196)
admit S=2 or S=4.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 top-level name; experimental alias is deprecated
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def build_seq_mesh(seq: int, data: int = 1, devices=None,
                   data_axis: str = "data", seq_axis: str = "seq") -> Mesh:
    """(data, seq) mesh; seq is the inner axis so the per-block all_to_all
    rides ICI-adjacent links."""
    devices = list(devices if devices is not None else jax.devices())
    assert data * seq == len(devices), (data, seq, len(devices))
    arr = np.asarray(devices).reshape(data, seq)
    return Mesh(arr, (data_axis, seq_axis))


def _vary(a, axis):
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(a, (axis,), to="varying")
    if hasattr(jax.lax, "pvary"):  # pragma: no cover - older jax
        return jax.lax.pvary(a, (axis,))
    return a  # pragma: no cover - pre-VMA jax: untyped


def sp_divided_block(p, cls, grid_ns, T: int, num_heads: int, axis: str):
    """One divided block under sequence parallelism.

    cls: (B, 1, D), replicated. grid_ns: (B, N/S, T, D) — the local
    position shard, frame-major within each position (the (h w t) order of
    divided_block's flat grid). Returns (cls, grid_ns) in the same layout.
    Must run inside shard_map over ``axis``.
    """
    from ..models.timesformer import attn_phase, mlp_phase_res, temporal_phase

    B, N_loc, _, D = grid_ns.shape

    # --- temporal attention: local over the position shard ---------------
    xt = temporal_phase(p["temporal_norm1"], p["temporal_attn"],
                        p["temporal_fc"], grid_ns.reshape(B * N_loc, T, D),
                        num_heads)
    xt = xt.reshape(B, N_loc, T, D)

    # --- reshard N-sharded -> T-sharded (1/S of the grid per device) -----
    xt_ts = jax.lax.all_to_all(xt, axis, split_axis=2, concat_axis=1,
                               tiled=True)  # (B, N, T/S, D)
    N, T_loc = xt_ts.shape[1], xt_ts.shape[2]

    # --- spatial attention: local over the frame shard -------------------
    xs = xt_ts.transpose(0, 2, 1, 3).reshape(B * T_loc, N, D)
    cls_rep = jnp.broadcast_to(cls, (B, T_loc, D)).reshape(B * T_loc, 1, D)
    xs = jnp.concatenate([_vary(cls_rep, axis), xs], axis=1)
    res_s = attn_phase(p["norm1"], p["attn"], xs, num_heads)

    # CLS averaged over ALL T frames: local sum over the frame shard, then
    # one psum (ref: models/timesformer.py:161-164 semantics)
    cls_part = res_s[:, 0, :].reshape(B, T_loc, D).sum(axis=1, keepdims=True)
    cls = cls + jax.lax.psum(cls_part, axis) / T

    res_sp = res_s[:, 1:, :].reshape(B, T_loc, N, D).transpose(0, 2, 1, 3)
    grid_ts = xt_ts + res_sp  # (B, N, T/S, D)

    # --- MLP: position-wise, local under either sharding -----------------
    cls = mlp_phase_res(p["norm2"], p["mlp"], cls)
    grid_ts = mlp_phase_res(
        p["norm2"], p["mlp"], grid_ts.reshape(B, N * T_loc, D)
    ).reshape(B, N, T_loc, D)

    # --- reshard back to N-sharded for the next block's temporal half ----
    grid_ns = jax.lax.all_to_all(grid_ts, axis, split_axis=1, concat_axis=2,
                                 tiled=True)  # (B, N/S, T, D)
    return cls, grid_ns


def sp_forward_features(
    params: Any,
    x: jnp.ndarray,
    cfg,
    mesh: Mesh,
    axis: str = "seq",
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Sequence-parallel twin of models.timesformer.forward_features (CLS
    features, divided space-time path): the token grid is sharded over
    spatial positions between blocks, resharded to frames inside each
    block's spatial half. Values == forward_features."""
    from ..models.timesformer import (interp_nearest_1d, layer_norm,
                                      patch_embed, resize_pos_embed)

    assert cfg.attention_type == "divided_space_time", cfg.attention_type
    S = mesh.shape[axis]
    B, C, T, Himg, Wimg = x.shape
    ps = cfg.patch_size
    W = Wimg // ps
    H = Himg // ps
    N = H * W
    D = cfg.embed_dim
    assert N % S == 0 and T % S == 0, (N, T, S)

    # --- embedding: identical op sequence to forward_features ------------
    x = x.astype(compute_dtype)
    frames = x.transpose(0, 2, 3, 4, 1).reshape(B * T, Himg, Wimg, C)
    tok = patch_embed(params["patch_embed"], frames, ps)
    cls = jnp.broadcast_to(
        params["cls_token"].astype(compute_dtype), (B * T, 1, D))
    xt = jnp.concatenate([cls, tok], axis=1)
    pe = params["pos_embed"]
    if xt.shape[1] != pe.shape[1]:
        pe = resize_pos_embed(pe, xt.shape[1], W)
    xt = xt + pe.astype(compute_dtype)

    cls_tok = xt[:B, :1, :]
    spat = xt[:, 1:, :]
    spat = spat.reshape(B, T, N, D).transpose(0, 2, 1, 3)  # (B, N, T, D)
    te = params["time_embed"]
    if T != te.shape[1]:
        te = interp_nearest_1d(te, T, axis=1)
    grid = spat + te.astype(compute_dtype)[:, None, :, :]

    def run(blocks, cls, grid_ns):
        def body(carry, bp):
            return sp_divided_block(bp, carry[0], carry[1], T,
                                    cfg.num_heads, axis), None

        (cls, _), _ = jax.lax.scan(body, (cls, grid_ns), blocks)
        return cls

    specs_b = jax.tree.map(lambda _: P(), params["blocks"])
    try:
        # partial-auto (jax >= 0.8): only the seq axis is manual, so a
        # data axis on the same mesh keeps sharding the batch under GSPMD
        sm = shard_map(run, mesh=mesh,
                       in_specs=(specs_b, P(), P(None, axis, None, None)),
                       out_specs=P(), axis_names={axis})
    except TypeError:  # pragma: no cover - older jax: all axes manual
        sm = shard_map(run, mesh=mesh,
                       in_specs=(specs_b, P(), P(None, axis, None, None)),
                       out_specs=P())
    cls_tok = sm(params["blocks"], cls_tok, grid)

    return layer_norm(params["norm"], cls_tok, eps=cfg.norm_eps)[:, 0]
