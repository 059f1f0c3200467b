"""Banded one-pass scoring forwards: overlap-window sharing on TPU.

The exact scorer pushes every frame's pixels through ~6.8 ViT-frame-unit
forwards: each frame is re-processed inside 3 overlapping student windows
(ref: dino_loss_loader.py:126-171 materializes the window copies;
dino_similarity.py:82-88 runs a forward per window) plus ~30/8 amortized
teacher rows.  The banded pass processes each frame ONCE:

* temporal attention is masked to the frame's clamp-shifted window — the
  identical index arithmetic to data/windows.py ``window_indices``
  (``lo_i = clip(i - eff//2, 0, T - eff)``), so every frame sees exactly
  the temporal key set the windowed forward gives the window's CENTER
  frame;
* spatial attention runs per frame with a PER-FRAME CLS token (the
  windowed forward has one CLS per window; here window(i)'s CLS is owned
  by frame i);
* each frame's CLS aggregates over its window: for every t in win(i) the
  CLS attends [cls_i, patches_t] and the results are averaged — the
  reference's broadcast-attend-average CLS protocol
  (ref: models/timesformer.py:140-176), instantiated per frame.

Exactness: when the video length equals the window length every frame's
window is the whole video, and (with a constant time embedding) the
banded pass reproduces the windowed forward bit-for-bit for every frame
(tests/test_banded.py pins this).  For longer videos the approximation is
that a window's OFF-CENTER frames contribute through their own banded
context rather than the window's — the receptive field grows by
±(eff//2) per block — and all frames carry the window-center time
embedding.  Quantified by tools/validate_fast_scoring.py before any
default promotion.  In exchange the per-frame FLOP bill drops from ~6.8
to ~2 frame-units (0.33 → ~0.10 TFLOP/frame on ViT-B) — the only
roofline-consistent route to the 1000 f/s target (BENCH.md).

Implementation: slab-blocked attention.  Queries are processed in blocks
of P frames; keys come from a (P + 2*(eff-1))-frame slab gathered around
the block, masked per query to the exact clamp-shifted window.  The same
structure maps 1:1 onto the Pallas kernels (ops/banded_block.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import timesformer as tsf


def band_starts(idx: jnp.ndarray, eff: int, t_real) -> jnp.ndarray:
    """Per-frame window start ``lo_i`` — clamp-for-clamp the arithmetic of
    data/windows.py ``window_indices`` (windows shift at the edges, never
    shrink): window(i) = [lo_i, lo_i + eff)."""
    return jnp.clip(idx - eff // 2, 0, jnp.maximum(t_real - eff, 0))


def _band_mask(lo_b: jnp.ndarray, s0, S: int, eff: int) -> jnp.ndarray:
    """(P, S) bool: slab key j (absolute row s0 + j) inside query i's
    clamp-shifted window [lo_i, lo_i + eff)."""
    kj = s0 + jnp.arange(S)
    return (kj[None, :] >= lo_b[:, None]) & (kj[None, :] < lo_b[:, None] + eff)


def _block_size(C: int, block: int) -> int:
    """Largest query-block size <= ``block`` that divides C (static)."""
    P = min(block, C)
    while C % P:
        P -= 1
    return P


def _banded_temporal(p_norm, p_attn, p_fc, x, lo, eff: int, num_heads: int,
                     block: int):
    """x + temporal_fc(proj(banded_attn(LN(x)))) — the divided block's
    temporal half (ref: models/timesformer.py:124-135) with the attention
    masked to per-frame clamp-shifted windows.  x: (C, N, D)."""
    C, N, D = x.shape
    H = num_heads
    hd = D // H
    scale = hd ** -0.5
    y = tsf.layer_norm(p_norm, x)
    qkv = tsf.linear(p_attn["qkv"], y).reshape(C, N, 3, H, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (C, N, H, hd)

    P = _block_size(C, block)
    nb = C // P
    halo = eff - 1
    S = min(C, P + 2 * halo)

    def body(_, b):
        q_b = jax.lax.dynamic_slice_in_dim(q, b * P, P, axis=0)
        s0 = jnp.clip(b * P - halo, 0, C - S)
        k_s = jax.lax.dynamic_slice_in_dim(k, s0, S, axis=0)
        v_s = jax.lax.dynamic_slice_in_dim(v, s0, S, axis=0)
        scores = jnp.einsum("pnhd,snhd->hnps", q_b, k_s,
                            preferred_element_type=jnp.float32) * scale
        lo_b = jax.lax.dynamic_slice_in_dim(lo, b * P, P)
        valid = _band_mask(lo_b, s0, S, eff)  # (P, S)
        scores = jnp.where(valid[None, None], scores, -jnp.inf)
        pr = jax.nn.softmax(scores, axis=-1).astype(v_s.dtype)
        return None, jnp.einsum("hnps,snhd->pnhd", pr, v_s)

    # scan-with-stacked-output rather than fori_loop + dynamic_update of a
    # full (C, N, H, hd) accumulator: XLA schedules the per-block emission
    # measurably better at large C
    _, out = jax.lax.scan(body, None, jnp.arange(nb))
    res = tsf.linear(p_attn["proj"], out.reshape(C, N, D))
    return x + tsf.linear(p_fc, res)


def _banded_spatial(p_norm, p_attn, cls, x, lo, eff: int, num_heads: int,
                    block: int):
    """Per-frame spatial attention with per-frame CLS + windowed CLS
    aggregation (ref: models/timesformer.py:140-176, per frame).

    Patches of frame t attend [cls_t, patches_t]; cls_i attends
    [cls_i, patches_t] for every t in win(i), outputs averaged over the
    window.  cls: (C, 1, D); x: (C, N, D).  Returns the post-projection
    attention residuals (cls_res (C, 1, D), pat_res (C, N, D))."""
    C, N, D = x.shape
    H = num_heads
    hd = D // H
    scale = hd ** -0.5
    y_c = tsf.layer_norm(p_norm, cls)
    y_p = tsf.layer_norm(p_norm, x)
    qkv_c = tsf.linear(p_attn["qkv"], y_c).reshape(C, 3, H, hd)
    qkv_p = tsf.linear(p_attn["qkv"], y_p).reshape(C, N, 3, H, hd)
    q_c, k_c, v_c = qkv_c[:, 0], qkv_c[:, 1], qkv_c[:, 2]        # (C, H, hd)
    q_p, k_p, v_p = qkv_p[:, :, 0], qkv_p[:, :, 1], qkv_p[:, :, 2]

    P = _block_size(C, block)
    nb = C // P
    halo = eff - 1
    S = min(C, P + 2 * halo)

    def body(_, b):
        def blk(a):
            return jax.lax.dynamic_slice_in_dim(a, b * P, P, axis=0)

        qp_b, kp_b, vp_b = blk(q_p), blk(k_p), blk(v_p)
        qc_b, kc_b, vc_b = blk(q_c), blk(k_c), blk(v_c)

        # --- patches attend [cls_t, patches_t] of their own frame -------
        s_pp = jnp.einsum("tnhd,tmhd->thnm", qp_b, kp_b,
                          preferred_element_type=jnp.float32) * scale
        s_pc = jnp.einsum("tnhd,thd->thn", qp_b, kc_b,
                          preferred_element_type=jnp.float32) * scale
        logits = jnp.concatenate([s_pc[..., None], s_pp], axis=-1)
        pr = jax.nn.softmax(logits, axis=-1).astype(x.dtype)  # (P,H,N,1+N)
        o_p = (jnp.einsum("thnm,tmhd->tnhd", pr[..., 1:], vp_b)
               + jnp.einsum("thn,thd->tnhd", pr[..., 0], vc_b))

        # --- cls_i attends [cls_i, patches_t] for t in win(i), averaged --
        s0 = jnp.clip(b * P - halo, 0, C - S)
        kp_s = jax.lax.dynamic_slice_in_dim(k_p, s0, S, axis=0)
        vp_s = jax.lax.dynamic_slice_in_dim(v_p, s0, S, axis=0)
        s_cp = jnp.einsum("phd,snhd->hpsn", qc_b, kp_s,
                          preferred_element_type=jnp.float32) * scale
        s_cc = jnp.einsum("phd,phd->hp", qc_b, kc_b,
                          preferred_element_type=jnp.float32) * scale
        # joint softmax over [self-cls, N slab-frame patches] per (i, t)
        m = jnp.maximum(jnp.max(s_cp, axis=-1), s_cc[:, :, None])  # (H,P,S)
        e_cp = jnp.exp(s_cp - m[..., None])
        e_cc = jnp.exp(s_cc[:, :, None] - m)
        den = e_cc + e_cp.sum(axis=-1)
        o_ct = (jnp.einsum("hpsn,snhd->hpsd", e_cp,
                           vp_s.astype(jnp.float32))
                + e_cc[..., None] * vc_b.astype(jnp.float32)
                .transpose(1, 0, 2)[:, :, None, :]) / den[..., None]
        lo_b = jax.lax.dynamic_slice_in_dim(lo, b * P, P)
        valid = _band_mask(lo_b, s0, S, eff).astype(jnp.float32)
        o_c = jnp.einsum("hpsd,ps->phd", o_ct, valid) / eff
        return None, (o_p, o_c.astype(x.dtype))

    _, (pat_out, cls_out) = jax.lax.scan(body, None, jnp.arange(nb))
    pat_res = tsf.linear(p_attn["proj"], pat_out.reshape(C, N, D))
    cls_res = tsf.linear(p_attn["proj"], cls_out.reshape(C, 1, D))
    return cls_res, pat_res


def _banded_spatial_fused(p_norm, p_attn, cls, x, t_real, eff: int,
                          num_heads: int):
    """Fused-path twin of _banded_spatial: the per-frame patch/own-CLS
    attention (incl. the patch residual) runs through the per-frame-CLS
    spatial kernel, which also exports the LN+qkv K/V rows and the CLS
    queries; the CLS window aggregation then runs as its own kernel over
    those exports (ops/banded_block.cls_band_attn) — no recompute, no
    HBM score tensors.

    Returns (cls_res (C, 1, D), x_new (C, N, D) WITH residual applied).
    """
    from ..ops import banded_block as bb

    C, N, D = x.shape
    x_new, _cls_rows, kv_pat, kv_cls, q_cls = bb.spatial_phase_pf(
        p_norm, p_attn, cls[:, 0], x, num_heads)
    band = bb.cls_band_attn(q_cls, kv_cls, kv_pat, t_real, eff, num_heads)
    cls_res = tsf.linear(p_attn["proj"],
                         band.astype(x.dtype).reshape(C, 1, D))
    return cls_res, x_new


def banded_block(p, cls, x, lo, eff: int, num_heads: int, block: int,
                 t_real=None, use_fused: bool = False):
    """One divided block (ref: models/timesformer.py:116-185) in banded
    form: banded temporal half, per-frame spatial half with windowed CLS
    aggregation, position-wise MLP on patches and CLS.

    ``use_fused`` routes the temporal attention through the Pallas kernel
    (ops/banded_block.py — scores never touch HBM, locations packed) and
    the MLPs through the fused row kernels; the per-frame spatial half
    and the CLS window aggregation keep XLA for now."""
    if use_fused:
        from ..ops import banded_block as bb

        x = bb.banded_temporal_phase(
            p["temporal_norm1"], p["temporal_attn"], p["temporal_fc"],
            x, t_real, eff, num_heads)
        cls_res, x = _banded_spatial_fused(p["norm1"], p["attn"], cls, x,
                                           t_real, eff, num_heads)
        cls = cls + cls_res
    else:
        x = _banded_temporal(p["temporal_norm1"], p["temporal_attn"],
                             p["temporal_fc"], x, lo, eff, num_heads, block)
        cls_res, pat_res = _banded_spatial(p["norm1"], p["attn"], cls, x,
                                           lo, eff, num_heads, block)
        cls = cls + cls_res
        x = x + pat_res
    cls = cls + tsf.mlp(p["mlp"], tsf.layer_norm(p["norm2"], cls))
    x = tsf.mlp_phase_res(p["norm2"], p["mlp"], x, use_fused=use_fused)
    return cls, x


def banded_cls_features(params, frames, t_real, cfg, *, eff: int,
                        compute_dtype=jnp.float32, block: int = 32):
    """Per-frame CLS features of ONE banded pass over a frame chunk.

    frames: (C, Himg, Wimg, 3) normalized channels-last; t_real: traced
    count of valid frames (rows >= t_real are padding — their outputs are
    garbage and must be discarded by the caller, but they never leak into
    valid rows: every valid frame's window is masked to [0, t_real)).
    eff: STATIC window/band length — local_size for the student pass,
    min(global_size, T) for the teacher.  Returns (C, D) float32.
    """
    C, Himg, Wimg, _ = frames.shape
    ps = cfg.patch_size
    W = Wimg // ps
    D = cfg.embed_dim
    x = frames.astype(compute_dtype)
    tok = tsf.patch_embed(params["patch_embed"], x, ps)  # (C, N, D)
    cls = jnp.broadcast_to(
        params["cls_token"].astype(compute_dtype), (C, 1, D))
    xt = jnp.concatenate([cls, tok], axis=1)
    pe = params["pos_embed"]
    if xt.shape[1] != pe.shape[1]:
        pe = tsf.resize_pos_embed(pe, xt.shape[1], W)
    xt = xt + pe.astype(compute_dtype)
    cls, x = xt[:, :1], xt[:, 1:]
    te = params["time_embed"]
    if eff != te.shape[1]:
        te = tsf.interp_nearest_1d(te, eff, axis=1)
    # every frame sits at the center of its own window: the center
    # embedding (exact for interior frames' own rows; the off-center
    # embedding delta is part of the banded approximation)
    x = x + te[0, eff // 2].astype(compute_dtype)
    lo = band_starts(jnp.arange(C), eff, t_real)

    from ..ops import banded_block as bb

    use_fused = (cfg.use_fused and bb.banded_ok(D, cfg.num_heads)
                 and jnp.dtype(compute_dtype) in (jnp.bfloat16, jnp.float32))

    def body(carry, bp):
        c, g = banded_block(bp, carry[0], carry[1], lo, eff,
                            cfg.num_heads, block, t_real=t_real,
                            use_fused=use_fused)
        return (c, g), None

    (cls, _), _ = jax.lax.scan(body, (cls, x), params["blocks"])
    out = tsf.layer_norm(params["norm"], cls, eps=cfg.norm_eps)
    return out[:, 0].astype(jnp.float32)
