"""Pallas TPU kernels for the banded one-pass scoring forwards.

The XLA banded passes (models/banded.py) measure ~30-55 TF/s on the
bench chip: the slab-blocked attention materializes its (H, N, P, S)
score tensors in HBM and issues per-location micro-matmuls. This module
provides the banded TEMPORAL attention as one Pallas kernel:

* LN + the qkv projection stay in XLA (one large MXU-efficient matmul);
  the kernel consumes q and kv blockwise, so scores never touch HBM;
* keys come from a 3-frame-block slab (prev/cur/next blocks of P frames
  via clamped BlockSpec index maps — fake absolute indices of the edge
  duplicates fall outside the band mask, so no special-casing);
* locations are PACKED block-diagonally into the score matmul (the r4
  lesson from ops/attention.py: per-location (P, S) dots are MXU
  issue-slot-bound at these sizes) with the band AND location masks
  applied after the exp, and the softmax denominator ridden on a ones
  column of V (no cross-lane reduction);
* coverage requires P >= eff - 1 (the end-clamped windows reach eff-1
  frames back) — asserted, P=32 covers the production eff<=30.

Values equal models/banded._banded_temporal to bf16 tolerance
(tests/test_banded_kernels.py pins CPU-interpret and the real chip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_block import _CLAMP, _dot, _fold_scale, _interpret, _fwd_params


def banded_ok(D: int, num_heads: int) -> bool:
    """Shape gate (mirrors fused_block.fused_ok): 128-lane-divisible model
    dim, head_dim < 128 so the ones-column denominator fits the tile."""
    return D % 128 == 0 and D // num_heads < 128


def _banded_temporal_kernel(t_ref, q_ref, kvp_ref, kvc_ref, kvn_ref, o_ref,
                            *, eff: int, num_heads: int, pack: int):
    """One (frame-block, location-block) grid step.

    q (1, P, 1, bn, D) bf16; kv* three (1, P, 1, bn, 2D) bf16 slab blocks;
    t_ref (1, 1) SMEM int32 valid-frame count; o (1, P, 1, bn, D)."""
    _, P, _, bn, D = q_ref.shape
    H = num_heads
    hd = D // H
    S = 3 * P
    Lp = pack
    G = bn // Lp

    ci = pl.program_id(0)
    t_real = t_ref[0, 0]

    q = q_ref[0, :, 0]  # (P, bn, D)
    kv = jnp.concatenate(
        [kvp_ref[0, :, 0], kvc_ref[0, :, 0], kvn_ref[0, :, 0]],
        axis=0)  # (S, bn, 2D)
    # location-major, then pack Lp locations per score matmul (contiguous
    # reshapes only — lane slices happen after, per the Mosaic rule)
    qt = jnp.swapaxes(q, 0, 1).reshape(G, Lp * P, D)
    kvt = jnp.swapaxes(kv, 0, 1).reshape(G, Lp * S, 2 * D)

    # mask on the packed (Lp*P, Lp*S) score matrix: same location AND the
    # key's absolute frame index inside the query's clamp-shifted window.
    # prev/next blocks clamped at the array edges keep their FAKE absolute
    # indices here (< 0 or >= t_real), which the band test rejects.
    ri = jax.lax.broadcasted_iota(jnp.int32, (Lp * P, Lp * S), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (Lp * P, Lp * S), 1)
    qi = ci * P + ri % P
    kj = (ci - 1) * P + rj % S
    lo = jnp.clip(qi - eff // 2, 0, jnp.maximum(t_real - eff, 0))
    mask = ((ri // P == rj // S) & (kj >= lo)
            & (kj < lo + eff)).astype(jnp.float32)

    ones = jnp.ones((G, Lp * S, 128 - hd), jnp.bfloat16)
    head_outs = []
    for h in range(H):
        qh = qt[:, :, h * hd:(h + 1) * hd]
        kh = kvt[:, :, h * hd:(h + 1) * hd]
        vh = kvt[:, :, D + h * hd:D + (h + 1) * hd]
        qh, post = _fold_scale(qh, hd)
        s = _dot(qh, kh, (((2,), (2,)), ((0,), (0,))),
                 preferred_element_type=jnp.float32)  # (G, LpP, LpS)
        if post is not None:
            s = s * post
        p = (jnp.exp(jnp.clip(s, -_CLAMP, _CLAMP)) * mask).astype(
            jnp.bfloat16)
        v_aug = jnp.concatenate([vh, ones], axis=2)
        acc = _dot(p, v_aug, (((2,), (1,)), ((0,), (0,))),
                   preferred_element_type=jnp.float32)
        head_outs.append(
            (acc[:, :, :hd] * (1.0 / acc[:, :, -1:])).astype(jnp.bfloat16))
    out = jnp.concatenate(head_outs, axis=2)  # (G, Lp*P, D)
    out = jnp.swapaxes(out.reshape(bn, P, D), 0, 1)  # (P, bn, D)
    o_ref[0, :, 0] = out.astype(o_ref.dtype)


def banded_temporal_attn(q: jnp.ndarray, kv: jnp.ndarray, t_real,
                         eff: int, num_heads: int,
                         block_p: int = 32, block_n: int = 0,
                         pack: int = 0) -> jnp.ndarray:
    """Banded multi-head attention over the frame axis.

    q (C, N, D), kv (C, N, 2D) — the qkv projection computed in XLA
    (operands are cast to bf16; accumulation is f32 in-kernel). Returns
    (C, N, D) bf16 pre-projection attention outputs with each frame's
    queries masked to its clamp-shifted eff-frame window.
    """
    C, N, D = q.shape
    P = min(block_p, C)
    while C % P:
        P -= 1
    assert P >= eff - 1, (
        f"frame block {P} cannot cover the end-clamped {eff}-frame window")
    if not block_n:
        # VMEM: the kv slab is 3 blocks of (P, bn, 2D) bf16 — keep it
        # around ~8 MB under the 16 MB scoped budget
        block_n = N
        while 3 * P * block_n * 2 * D * 2 > 8 * 1024 * 1024 or N % block_n:
            block_n -= 1
    bn = block_n
    if not pack:
        pack = 1
        for cand in range(min(bn, max(1, 256 // P)), 1, -1):
            if bn % cand == 0:
                pack = cand
                break
    nbc = C // P
    nbn = N // bn

    q5 = q.astype(jnp.bfloat16).reshape(nbc, P, nbn, bn, D)
    kv5 = kv.astype(jnp.bfloat16).reshape(nbc, P, nbn, bn, 2 * D)
    t_arr = jnp.full((1, 1), t_real, jnp.int32)

    q_spec = pl.BlockSpec((1, P, 1, bn, D), lambda ci, ni: (ci, 0, ni, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_specs = [
        pl.BlockSpec((1, P, 1, bn, 2 * D),
                     lambda ci, ni: (jnp.maximum(ci - 1, 0), 0, ni, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P, 1, bn, 2 * D),
                     lambda ci, ni: (ci, 0, ni, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P, 1, bn, 2 * D),
                     lambda ci, ni: (jnp.minimum(ci + 1, nbc - 1), 0, ni,
                                     0, 0),
                     memory_space=pltpu.VMEM),
    ]
    t_spec = pl.BlockSpec((1, 1), lambda ci, ni: (0, 0),
                          memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_banded_temporal_kernel, eff=eff,
                          num_heads=num_heads, pack=pack),
        out_shape=jax.ShapeDtypeStruct((nbc, P, nbn, bn, D), jnp.bfloat16),
        grid=(nbc, nbn),
        in_specs=[t_spec, q_spec] + kv_specs,
        out_specs=q_spec,
        cost_estimate=pl.CostEstimate(
            flops=C * N * 4 * 3 * P * D * pack,
            bytes_accessed=8 * C * N * D,
            transcendentals=C * N * 3 * P * pack,
        ),
        interpret=_interpret(),
        compiler_params=_fwd_params(),
    )(t_arr, q5, *([kv5] * 3))
    return out.reshape(C, N, D)


def _spatial_pf_kernel(x_ref, cls_ref, g_ref, b_ref, wqkv_ref, bqkv_ref,
                       wproj_ref, bproj_ref, go_ref, co_ref, kv_ref,
                       kvc_ref, qc_ref, *, num_heads: int):
    """Per-frame-CLS variant of fused_block._spatial_phase_kernel: the
    banded pass owns one CLS token PER FRAME, so cls arrives as (1, F, D)
    rows instead of one (1, 1, D) row broadcast over the F frames — which
    lets one grid step batch F frames of a chunk (F*(N+1) MXU rows)
    instead of running the shared-CLS kernel at T=1."""
    _, F, N, D = x_ref.shape
    H = num_heads
    hd = D // H
    L = N + 1

    x = x_ref[0]  # (F, N, D)
    cls = cls_ref[0].reshape(F, 1, D)
    seq = jnp.concatenate([cls.astype(x.dtype), x], axis=1)  # (F, L, D)

    xf = seq.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
    y = (y * g_ref[0] + b_ref[0]).astype(jnp.bfloat16)

    qkv = _dot(y.reshape(F * L, D), wqkv_ref[:], (((1,), (0,)), ((), ())),
               preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0]).astype(jnp.bfloat16).reshape(F, L, 3 * D)

    ones = jnp.ones((F, L, 128 - hd), jnp.bfloat16)
    head_outs = []
    for h in range(H):
        q = qkv[:, :, h * hd:(h + 1) * hd]
        k = qkv[:, :, D + h * hd:D + (h + 1) * hd]
        v = qkv[:, :, 2 * D + h * hd:2 * D + (h + 1) * hd]
        q, post = _fold_scale(q, hd)
        s = _dot(q, k, (((2,), (2,)), ((0,), (0,))),
                 preferred_element_type=jnp.float32)
        if post is not None:
            s = s * post
        p = jnp.exp(jnp.clip(s, -_CLAMP, _CLAMP)).astype(jnp.bfloat16)
        v_aug = jnp.concatenate([v, ones], axis=2)
        acc = _dot(p, v_aug, (((2,), (1,)), ((0,), (0,))),
                   preferred_element_type=jnp.float32)
        head_outs.append(
            (acc[:, :, :hd] * (1.0 / acc[:, :, -1:])).astype(jnp.bfloat16))
    a = jnp.concatenate(head_outs, axis=2).reshape(F * L, D)

    proj = _dot(a, wproj_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    proj = (proj + bproj_ref[0]).reshape(F, L, D)
    go_ref[0] = (x_ref[0] + proj[:, 1:, :].astype(x_ref.dtype)).astype(
        go_ref.dtype)
    co_ref[0] = proj[:, 0, :].astype(co_ref.dtype)
    # export the patch K/V rows, the cls rows' own K/V, and the cls
    # queries for the CLS window-aggregation kernel (cls_band_attn): one
    # HBM write instead of recomputing 2/3 of the qkv matmul outside
    kv_ref[0] = qkv[:, 1:, D:]
    kvc_ref[0] = qkv[:, 0, D:]
    qc_ref[0] = qkv[:, 0, :D]


def spatial_phase_pf(p_norm, p_attn, cls: jnp.ndarray, x: jnp.ndarray,
                     num_heads: int, block_f: int = 4):
    """Per-frame-CLS spatial phase: x (C, N, D), cls (C, D) ->
    (x + res (C, N, D), cls attention rows (C, D) post-proj,
    kv (C, N+1, 2D) bf16 — the LN+qkv K/V rows of [cls_i, patches_i],
    consumed by cls_band_attn)."""
    C, N, D = x.shape
    F = min(block_f, C)
    while C % F:
        F -= 1
    x4 = x.reshape(C // F, F, N, D)
    cls3 = cls.reshape(C // F, F, D)

    g = p_norm["scale"].astype(jnp.float32).reshape(1, D)
    b = p_norm["bias"].astype(jnp.float32).reshape(1, D)
    wqkv = p_attn["qkv"]["kernel"].astype(jnp.bfloat16)
    bqkv = p_attn["qkv"].get("bias")
    bqkv = (jnp.zeros((3 * D,)) if bqkv is None else bqkv).astype(
        jnp.float32).reshape(1, 3 * D)
    wproj = p_attn["proj"]["kernel"].astype(jnp.bfloat16)
    bproj = p_attn["proj"]["bias"].astype(jnp.float32).reshape(1, D)

    x_spec = pl.BlockSpec((1, F, N, D), lambda ci: (ci, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((1, F, D), lambda ci: (ci, 0, 0),
                          memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(shape, lambda ci: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, F, N, 2 * D), lambda ci: (ci, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    f_spec = lambda w: pl.BlockSpec((1, F, w), lambda ci: (ci, 0, 0),
                                    memory_space=pltpu.VMEM)
    grid_out, cls_rows, kv, kv_c, q_cls = pl.pallas_call(
        functools.partial(_spatial_pf_kernel, num_heads=num_heads),
        out_shape=(jax.ShapeDtypeStruct((C // F, F, N, D), x.dtype),
                   jax.ShapeDtypeStruct((C // F, F, D), x.dtype),
                   jax.ShapeDtypeStruct((C // F, F, N, 2 * D),
                                        jnp.bfloat16),
                   jax.ShapeDtypeStruct((C // F, F, 2 * D), jnp.bfloat16),
                   jax.ShapeDtypeStruct((C // F, F, D), jnp.bfloat16)),
        grid=(C // F,),
        in_specs=[x_spec, c_spec, full(1, D), full(1, D), full(D, 3 * D),
                  full(1, 3 * D), full(D, D), full(1, D)],
        out_specs=(x_spec, c_spec, kv_spec, f_spec(2 * D), f_spec(D)),
        cost_estimate=pl.CostEstimate(
            flops=C * (N + 1) * (8 * D * D + 4 * (N + 1) * D),
            bytes_accessed=2 * C * N * D * x.dtype.itemsize,
            transcendentals=C * (N + 1) * (N + 1),
        ),
        interpret=_interpret(),
        compiler_params=_fwd_params(),
    )(x4, cls3, g, b, wqkv, bqkv, wproj, bproj)
    return (grid_out.reshape(C, N, D), cls_rows.reshape(C, D),
            kv.reshape(C, N, 2 * D), kv_c.reshape(C, 2 * D),
            q_cls.reshape(C, D))


def _cls_band_kernel(t_ref, q_ref, kvo_ref, kvt_ref, o_ref, acc_ref, *,
                     eff: int, num_heads: int, P: int, tf: int):
    """CLS window aggregation: for each frame i, mean over t in win(i) of
    softmax-attention(q=cls_i, keys=[cls_i, patches_t]) values.

    Each (cb, tb) grid step processes ALL N patches of ``tf`` candidate
    target frames, so every (i, t) pair's softmax denominator is complete
    within the step (the per-t normalization cannot be split across
    steps); normalized contributions accumulate in a (H, P, 128) VMEM
    scratch and are emitted on the last tb step.

    q (1, P, D): cls queries; kvo (1, P, 2D): the cls rows' own K/V (the
    self key); kvt (1, tf, N, 2D): target frames' patch K/V;
    o (1, P, D) pre-projection band outputs (already / eff)."""
    _, _, N, twoD = kvt_ref.shape
    D = twoD // 2
    H = num_heads
    hd = D // H

    cb = pl.program_id(0)
    tb = pl.program_id(1)
    n_tb = pl.num_programs(1)
    t_real = t_ref[0, 0]

    @pl.when(tb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # absolute indices: queries cb*P + i; target frames of this step
    # start at (cb-1)*P + tb*tf (fake/out-of-range values are masked)
    qi = cb * P + jax.lax.broadcasted_iota(jnp.int32, (P, tf), 0)
    tj = (cb - 1) * P + tb * tf + jax.lax.broadcasted_iota(
        jnp.int32, (P, tf), 1)
    lo = jnp.clip(qi - eff // 2, 0, jnp.maximum(t_real - eff, 0))
    inband = ((tj >= lo) & (tj < lo + eff)).astype(jnp.float32)  # (P, tf)

    kvt = kvt_ref[0].reshape(tf * N, twoD)  # contiguous; lane-slice after
    q_all = q_ref[0]      # (P, D)
    kvo = kvo_ref[0]      # (P, 2D)

    for h in range(H):
        qh = q_all[:, h * hd:(h + 1) * hd]
        qh, post = _fold_scale(qh, hd)
        kh = kvt[:, h * hd:(h + 1) * hd]
        vh = kvt[:, D + h * hd:D + (h + 1) * hd]
        ko = kvo[:, h * hd:(h + 1) * hd]
        vo = kvo[:, D + h * hd:D + (h + 1) * hd]

        s = _dot(qh, kh, (((1,), (1,)), ((), ())),
                 preferred_element_type=jnp.float32)  # (P, tf*N)
        s_self = jnp.sum(qh.astype(jnp.float32)
                         * ko.astype(jnp.float32), axis=1, keepdims=True)
        if post is not None:
            s = s * post
            s_self = s_self * post
        e = jnp.exp(jnp.clip(s, -_CLAMP, _CLAMP))
        e_self = jnp.exp(jnp.clip(s_self, -_CLAMP, _CLAMP))  # (P, 1)

        # per-(i, t) denominator: e_self + sum_n e — frame-group sums via
        # an MXU ones matmul (cross-lane reductions are the slow VPU path)
        grp = (jax.lax.broadcasted_iota(jnp.int32, (tf * N, tf), 0) // N
               == jax.lax.broadcasted_iota(jnp.int32, (tf * N, tf), 1)
               ).astype(jnp.bfloat16)
        den = e_self + _dot(e.astype(jnp.bfloat16), grp,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (P, tf)
        w = inband / den  # (P, tf): 0 for out-of-band frames
        # broadcast w to (P, tf*N) via the same group matrix (no lane-dim
        # reshape — Mosaic rejects splitting the lane axis), then fold the
        # per-t normalization into e so ONE PV matmul covers the window
        w_full = _dot(w.astype(jnp.bfloat16), grp,
                      (((1,), (1,)), ((), ())),
                      preferred_element_type=jnp.float32)
        e_w = e * w_full
        pv = _dot(e_w.astype(jnp.bfloat16), vh, (((1,), (0,)), ((), ())),
                  preferred_element_type=jnp.float32)  # (P, hd)
        self_w = (w.sum(axis=1, keepdims=True) * e_self)  # (P, 1)
        contrib = pv + self_w * vo.astype(jnp.float32)
        acc_ref[h, :, :hd] += contrib

    @pl.when(tb == n_tb - 1)
    def _emit():
        outs = [acc_ref[h, :, :hd] * (1.0 / eff) for h in range(H)]
        o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def cls_band_attn(q_cls: jnp.ndarray, kv_cls: jnp.ndarray,
                  kv_pat: jnp.ndarray, t_real, eff: int, num_heads: int,
                  block_p: int = 32, block_t: int = 4) -> jnp.ndarray:
    """q_cls (C, D), kv_cls (C, 2D) (own cls K/V rows), kv_pat
    (C, N, 2D): per-frame CLS window aggregation -> (C, D) pre-proj
    outputs (averaged over each frame's clamp-shifted eff-window)."""
    C, N, twoD = kv_pat.shape
    D = twoD // 2
    P = min(block_p, C)
    while C % P:
        P -= 1
    assert P >= eff - 1, (P, eff)
    tf = block_t
    while P % tf:
        tf -= 1
    nbc = C // P
    n_tb = 3 * P // tf

    q3 = q_cls.astype(jnp.bfloat16).reshape(nbc, P, D)
    kvo3 = kv_cls.astype(jnp.bfloat16).reshape(nbc, P, twoD)
    kvt4 = kv_pat.astype(jnp.bfloat16).reshape(C // tf, tf, N, twoD)
    t_arr = jnp.full((1, 1), t_real, jnp.int32)

    def kvt_index(cb, tb):
        fb = (cb - 1) * (P // tf) + tb
        return (jnp.clip(fb, 0, C // tf - 1), 0, 0, 0)

    out = pl.pallas_call(
        functools.partial(_cls_band_kernel, eff=eff, num_heads=num_heads,
                          P=P, tf=tf),
        out_shape=jax.ShapeDtypeStruct((nbc, P, D), jnp.bfloat16),
        grid=(nbc, n_tb),
        in_specs=[
            pl.BlockSpec((1, 1), lambda cb, tb: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, P, D), lambda cb, tb: (cb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, twoD), lambda cb, tb: (cb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tf, N, twoD), kvt_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P, D), lambda cb, tb: (cb, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((num_heads, P, 128), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=C * 3 * P * N * 4 * D,
            bytes_accessed=3 * C * N * twoD,
            transcendentals=C * 3 * P * N,
        ),
        interpret=_interpret(),
        compiler_params=_fwd_params(),
    )(t_arr, q3, kvo3, kvt4)
    return out.reshape(C, D)


def banded_temporal_phase(p_norm, p_attn, p_fc, x: jnp.ndarray, t_real,
                          eff: int, num_heads: int,
                          block_p: int = 32) -> jnp.ndarray:
    """x + temporal_fc(proj(banded_attn(LN(x)))) — the banded divided
    block's temporal half with the attention as a Pallas kernel and the
    dense layers as XLA matmuls (bf16 operands when x is bf16; the mixed
    tier keeps f32 carries with default-precision matmuls)."""
    from ..models import timesformer as tsf

    C, N, D = x.shape
    y = tsf.layer_norm(p_norm, x)
    qkv = tsf.linear(p_attn["qkv"], y)  # (C, N, 3D)
    o = banded_temporal_attn(qkv[..., :D], qkv[..., D:], t_real, eff,
                             num_heads, block_p=block_p)
    res = tsf.linear(p_attn["proj"], o.astype(x.dtype))
    return x + tsf.linear(p_fc, res)
