"""Fused transformer-block phase kernels (Pallas/TPU).

Measured on the bench chip (tools/attn_bench*.py, tools/ablate_forward.py),
the divided space-time block is HBM-bound: effective bandwidth is
~240 GB/s, and the XLA phase pipeline (LN write, qkv write, q/k/v
transposes, score tensor round trips, proj) moves ~2.5 GB per block per
phase at teacher shapes. These kernels compute a whole phase —

    attn phase:  LN -> qkv matmul -> per-head softmax(QK^T)V -> proj
    mlp phase:   LN -> fc1 -> gelu -> fc2

— in VMEM, so activations cross HBM exactly twice (read x, write out) and
weights are fetched once per grid sweep (constant index_map -> resident).

Softmax is max-free: scores are clamped to +/-80 and exponentiated in
f32 (softmax is shift-invariant; the clamp only bites where the output is
already saturated), and the denominator is produced BY THE MXU via ones
columns appended to V — no cross-lane reduction, the slow direction on
the VPU (see ops/attention.py for the standalone-kernel variant of the
same trick).

These kernels are inference-path only (no VJP); the training step keeps
the XLA phases. On non-TPU backends they run in Pallas interpreter mode,
which makes the CPU test suite exercise the same code path numerically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CLAMP = 80.0
_LN_EPS = 1e-6


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def fused_ok(x, num_heads: int | None = None) -> bool:
    """Dtype/shape gate for the per-call fused dispatch in
    models/timesformer.py's phase functions.

    * bf16 only: the kernels compute in bf16; f32 bit-parity forwards in
      the same process must keep the XLA phases untouched.
    * D % 128 == 0: Mosaic can only shape-cast (BB, L, D) <-> (BB*L, D)
      when D is a multiple of the 128-lane tile (vit_tiny's D=192 fails
      with 'unsupported shape cast').
    * head_dim < 128: the MXU softmax denominator rides ones columns
      appended to V up to the 128-lane tile, so hd == 128 leaves no room
      for the ones column (and hd > 128 is out of tile) — e.g. D=768 with
      6 heads must keep XLA."""
    if x.dtype != jnp.bfloat16 or x.shape[-1] % 128 != 0:
        return False
    return num_heads is None or x.shape[-1] // num_heads < 128


def should_fuse(compute_dtype) -> bool:
    """Default policy for CLIs/engines: fuse when computing bfloat16 on a
    real TPU (interpreter-mode kernels would slow CPU runs down). The
    result feeds TimeSformerConfig.use_fused; tests force the flag
    directly to exercise the kernels in interpreter mode."""
    return compute_dtype == jnp.bfloat16 and jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Fused attention phase: out = proj(mhsa(layer_norm(x)))
# ---------------------------------------------------------------------------

def _attn_phase_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                       bproj_ref, o_ref, *, num_heads: int):
    BB, L, D = x_ref.shape
    H = num_heads
    hd = D // H
    assert hd < 128, (hd, "MXU-denominator softmax needs a ones column")
    scale = hd ** -0.5

    # LayerNorm in f32 (parity with the XLA path)
    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + _LN_EPS)
    y = (y * g_ref[0] + b_ref[0]).astype(jnp.bfloat16)

    qkv = jax.lax.dot_general(
        y.reshape(BB * L, D), wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0]).astype(jnp.bfloat16).reshape(BB, L, 3 * D)

    ones = jnp.ones((BB, L, 128 - hd), jnp.bfloat16)
    head_outs = []
    for h in range(H):  # 12 unrolled iterations, batched over BB sequences
        q = qkv[:, :, h * hd:(h + 1) * hd]
        k = qkv[:, :, D + h * hd:D + (h + 1) * hd]
        v = qkv[:, :, 2 * D + h * hd:2 * D + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (BB, L, L)
        p = jnp.exp(jnp.clip(s, -_CLAMP, _CLAMP)).astype(jnp.bfloat16)
        v_aug = jnp.concatenate([v, ones], axis=2)  # (BB, L, 128)
        acc = jax.lax.dot_general(
            p, v_aug, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        head_outs.append(
            (acc[:, :, :hd] / acc[:, :, -1:]).astype(jnp.bfloat16))
    a = jnp.concatenate(head_outs, axis=2).reshape(BB * L, D)

    proj = jax.lax.dot_general(
        a, wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    proj = proj + bproj_ref[0]
    o_ref[:] = proj.reshape(BB, L, D).astype(o_ref.dtype)


def fused_attn_phase(p_norm, p_attn, x: jnp.ndarray, num_heads: int,
                     block_s: int = 0) -> jnp.ndarray:
    """Pallas twin of models.timesformer.attn_phase: x (S, L, D) ->
    proj(mhsa(LN(x))), one HBM pass each way."""
    S, L, D = x.shape
    if not block_s:
        # ~512 PADDED rows per program: Mosaic tiles the (L, D) minor dims,
        # so L pads up to the 16-sublane bf16 tile — budgeting on raw L
        # blows VMEM 5x for tiny L (student temporal L=3)
        l_pad = -(-L // 16) * 16
        block_s = max(1, min(S, 512 // l_pad))
    while S % block_s:
        block_s -= 1

    g = p_norm["scale"].astype(jnp.float32).reshape(1, D)
    b = p_norm["bias"].astype(jnp.float32).reshape(1, D)
    wqkv = p_attn["qkv"]["kernel"].astype(jnp.bfloat16)
    bqkv = p_attn["qkv"].get("bias")
    bqkv = (jnp.zeros((3 * D,)) if bqkv is None else bqkv).astype(
        jnp.float32).reshape(1, 3 * D)
    wproj = p_attn["proj"]["kernel"].astype(jnp.bfloat16)
    bproj = p_attn["proj"]["bias"].astype(jnp.float32).reshape(1, D)

    x_spec = pl.BlockSpec((block_s, L, D), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_phase_kernel, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((S, L, D), x.dtype),
        grid=(S // block_s,),
        in_specs=[x_spec, full(1, D), full(1, D), full(D, 3 * D),
                  full(1, 3 * D), full(D, D), full(1, D)],
        out_specs=x_spec,
        cost_estimate=pl.CostEstimate(
            flops=S * L * (8 * D * D + 4 * L * D),
            bytes_accessed=2 * S * L * D * x.dtype.itemsize,
            transcendentals=S * L * L,
        ),
        interpret=_interpret(),
    )(x, g, b, wqkv, bqkv, wproj, bproj)


# ---------------------------------------------------------------------------
# Fused spatial phase (frame-major layout): per frame t,
#   seq_t   = [cls, grid[:, t]]                       (1+N tokens)
#   res_t   = proj(mhsa(layer_norm(seq_t)))
#   grid_out[:, t] = grid[:, t] + res_t[1:]           (residual in-kernel)
#   cls_out[:, t]  = res_t[0]                         (raw, caller averages)
# ---------------------------------------------------------------------------

def _spatial_phase_kernel(x_ref, cls_ref, g_ref, b_ref, wqkv_ref, bqkv_ref,
                          wproj_ref, bproj_ref, go_ref, co_ref, *,
                          num_heads: int):
    _, F, N, D = x_ref.shape
    H = num_heads
    hd = D // H
    assert hd < 128, (hd, "MXU-denominator softmax needs a ones column")
    scale = hd ** -0.5
    L = N + 1

    x = x_ref[0]  # (F, N, D) grid tokens of F frames
    cls = jnp.broadcast_to(cls_ref[0].reshape(1, 1, D), (F, 1, D))
    seq = jnp.concatenate([cls.astype(x.dtype), x], axis=1)  # (F, L, D)

    xf = seq.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + _LN_EPS)
    y = (y * g_ref[0] + b_ref[0]).astype(jnp.bfloat16)

    qkv = jax.lax.dot_general(
        y.reshape(F * L, D), wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0]).astype(jnp.bfloat16).reshape(F, L, 3 * D)

    ones = jnp.ones((F, L, 128 - hd), jnp.bfloat16)
    head_outs = []
    for h in range(H):
        q = qkv[:, :, h * hd:(h + 1) * hd]
        k = qkv[:, :, D + h * hd:D + (h + 1) * hd]
        v = qkv[:, :, 2 * D + h * hd:2 * D + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (F, L, L)
        p = jnp.exp(jnp.clip(s, -_CLAMP, _CLAMP)).astype(jnp.bfloat16)
        v_aug = jnp.concatenate([v, ones], axis=2)  # (F, L, 128)
        acc = jax.lax.dot_general(
            p, v_aug, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        head_outs.append(
            (acc[:, :, :hd] / acc[:, :, -1:]).astype(jnp.bfloat16))
    a = jnp.concatenate(head_outs, axis=2).reshape(F * L, D)

    proj = jax.lax.dot_general(
        a, wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    proj = (proj + bproj_ref[0]).reshape(F, L, D)
    go_ref[0] = (x_ref[0] + proj[:, 1:, :].astype(x_ref.dtype)).astype(
        go_ref.dtype)
    co_ref[0, 0] = proj[:, 0, :].astype(co_ref.dtype)


def fused_spatial_phase(p_norm, p_attn, cls: jnp.ndarray, x: jnp.ndarray,
                        num_heads: int, block_f: int = 0):
    """The divided block's complete spatial half over FRAME-MAJOR grid
    tokens, glue-free (ref semantics: models/timesformer.py:140-176 of the
    reference — CLS broadcast into every frame's sequence, per-frame MHSA,
    CLS row returned per frame for the caller's temporal average).

    x (B, T, N, D): grid tokens, frame-major — the layout patch embedding
    produces naturally, so no (B,N,T,D) <-> (B*T,N,D) transpose copies and
    no CLS concat/slice ever materialize in HBM (VERDICT r2 next-#1: that
    XLA glue measured ~25% of the teacher forward).
    cls (B, 1, D). Returns (x + res (B, T, N, D), cls rows (B, T, D)).
    """
    B, T, N, D = x.shape
    L = N + 1
    if not block_f:
        l_pad = -(-L // 16) * 16
        block_f = max(1, min(T, 512 // l_pad))
    while T % block_f:
        block_f -= 1

    g = p_norm["scale"].astype(jnp.float32).reshape(1, D)
    b = p_norm["bias"].astype(jnp.float32).reshape(1, D)
    wqkv = p_attn["qkv"]["kernel"].astype(jnp.bfloat16)
    bqkv = p_attn["qkv"].get("bias")
    bqkv = (jnp.zeros((3 * D,)) if bqkv is None else bqkv).astype(
        jnp.float32).reshape(1, 3 * D)
    wproj = p_attn["proj"]["kernel"].astype(jnp.bfloat16)
    bproj = p_attn["proj"]["bias"].astype(jnp.float32).reshape(1, D)

    x_spec = pl.BlockSpec((1, block_f, N, D), lambda bi, ti: (bi, ti, 0, 0),
                          memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda bi, ti: (bi, 0, 0),
                            memory_space=pltpu.VMEM)
    # CLS rows come out as (B, T/bf, bf, D) so the block's last two dims
    # cover their array dims in full (bf is rarely 8-divisible)
    co_spec = pl.BlockSpec((1, 1, block_f, D), lambda bi, ti: (bi, ti, 0, 0),
                           memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(shape, lambda bi, ti: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    grid_out, cls_rows = pl.pallas_call(
        functools.partial(_spatial_phase_kernel, num_heads=num_heads),
        out_shape=(jax.ShapeDtypeStruct((B, T, N, D), x.dtype),
                   jax.ShapeDtypeStruct((B, T // block_f, block_f, D),
                                        x.dtype)),
        grid=(B, T // block_f),
        in_specs=[x_spec, cls_spec, full(1, D), full(1, D), full(D, 3 * D),
                  full(1, 3 * D), full(D, D), full(1, D)],
        out_specs=(x_spec, co_spec),
        cost_estimate=pl.CostEstimate(
            flops=B * T * L * (8 * D * D + 4 * L * D),
            bytes_accessed=2 * B * T * N * D * x.dtype.itemsize,
            transcendentals=B * T * L * L,
        ),
        interpret=_interpret(),
    )(x, cls, g, b, wqkv, bqkv, wproj, bproj)
    return grid_out, cls_rows.reshape(B, T, D)


# ---------------------------------------------------------------------------
# Fused temporal phase: out = x + fc(proj(mhsa(layer_norm(x))))
# ---------------------------------------------------------------------------

def _temporal_phase_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref,
                           wproj_ref, bproj_ref, wfc_ref, bfc_ref, o_ref, *,
                           num_heads: int):
    BB, L, D = x_ref.shape
    H = num_heads
    hd = D // H
    assert hd < 128, (hd, "MXU-denominator softmax needs a ones column")
    scale = hd ** -0.5

    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + _LN_EPS)
    y = (y * g_ref[0] + b_ref[0]).astype(jnp.bfloat16)

    qkv = jax.lax.dot_general(
        y.reshape(BB * L, D), wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0]).astype(jnp.bfloat16).reshape(BB, L, 3 * D)

    ones = jnp.ones((BB, L, 128 - hd), jnp.bfloat16)
    head_outs = []
    for h in range(H):
        q = qkv[:, :, h * hd:(h + 1) * hd]
        k = qkv[:, :, D + h * hd:D + (h + 1) * hd]
        v = qkv[:, :, 2 * D + h * hd:2 * D + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        p = jnp.exp(jnp.clip(s, -_CLAMP, _CLAMP)).astype(jnp.bfloat16)
        v_aug = jnp.concatenate([v, ones], axis=2)
        acc = jax.lax.dot_general(
            p, v_aug, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        head_outs.append(
            (acc[:, :, :hd] / acc[:, :, -1:]).astype(jnp.bfloat16))
    a = jnp.concatenate(head_outs, axis=2).reshape(BB * L, D)

    proj = jax.lax.dot_general(
        a, wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    proj = (proj + bproj_ref[0]).astype(jnp.bfloat16)
    fc = jax.lax.dot_general(
        proj, wfc_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    fc = (fc + bfc_ref[0]).reshape(BB, L, D)
    o_ref[:] = (x_ref[:] + fc.astype(x_ref.dtype)).astype(o_ref.dtype)


def fused_temporal_phase(p_norm, p_attn, p_fc, x: jnp.ndarray,
                         num_heads: int, block_s: int = 0) -> jnp.ndarray:
    """Pallas twin of models.timesformer.temporal_phase: the whole temporal
    half (LN, qkv, attention, proj, temporal_fc, residual) in one kernel."""
    S, L, D = x.shape
    if not block_s:
        l_pad = -(-L // 16) * 16  # see fused_attn_phase chooser
        block_s = max(1, min(S, 512 // l_pad))
    while S % block_s:
        block_s -= 1

    g = p_norm["scale"].astype(jnp.float32).reshape(1, D)
    b = p_norm["bias"].astype(jnp.float32).reshape(1, D)
    wqkv = p_attn["qkv"]["kernel"].astype(jnp.bfloat16)
    bqkv = p_attn["qkv"].get("bias")
    bqkv = (jnp.zeros((3 * D,)) if bqkv is None else bqkv).astype(
        jnp.float32).reshape(1, 3 * D)
    wproj = p_attn["proj"]["kernel"].astype(jnp.bfloat16)
    bproj = p_attn["proj"]["bias"].astype(jnp.float32).reshape(1, D)
    wfc = p_fc["kernel"].astype(jnp.bfloat16)
    bfc = p_fc["bias"].astype(jnp.float32).reshape(1, D)

    x_spec = pl.BlockSpec((block_s, L, D), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_temporal_phase_kernel, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((S, L, D), x.dtype),
        grid=(S // block_s,),
        in_specs=[x_spec, full(1, D), full(1, D), full(D, 3 * D),
                  full(1, 3 * D), full(D, D), full(1, D), full(D, D),
                  full(1, D)],
        out_specs=x_spec,
        cost_estimate=pl.CostEstimate(
            flops=S * L * (10 * D * D + 4 * L * D),
            bytes_accessed=2 * S * L * D * x.dtype.itemsize,
            transcendentals=S * L * L,
        ),
        interpret=_interpret(),
    )(x, g, b, wqkv, bqkv, wproj, bproj, wfc, bfc)


# ---------------------------------------------------------------------------
# Fused temporal phase over FRAME-MAJOR tokens: x (B, T, N, D) ->
# x + fc(proj(mhsa_over_T(layer_norm(x)))) with the position-major
# transposes done IN VMEM — the glue-free block layout (divided_block_fused)
# never materializes a (B, N, T, D) copy in HBM.
# ---------------------------------------------------------------------------

def _temporal_phase_tm_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref,
                              wproj_ref, bproj_ref, wfc_ref, bfc_ref, o_ref,
                              *, num_heads: int):
    _, T, _, BN, D = x_ref.shape
    H = num_heads
    hd = D // H
    assert hd < 128, (hd, "MXU-denominator softmax needs a ones column")
    scale = hd ** -0.5

    x = x_ref[0, :, 0].astype(jnp.float32)  # (T, BN, D)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + _LN_EPS)
    y = (y * g_ref[0] + b_ref[0]).astype(jnp.bfloat16)

    # frame-major -> position-major, in registers/VMEM (the only layout
    # change in the whole phase; its HBM twin costs 2 full-tensor passes
    # per block in the XLA path)
    yt = jnp.swapaxes(y, 0, 1)  # (BN, T, D)

    qkv = jax.lax.dot_general(
        yt.reshape(BN * T, D), wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0]).astype(jnp.bfloat16).reshape(BN, T, 3 * D)

    ones = jnp.ones((BN, T, 128 - hd), jnp.bfloat16)
    head_outs = []
    for h in range(H):
        q = qkv[:, :, h * hd:(h + 1) * hd]
        k = qkv[:, :, D + h * hd:D + (h + 1) * hd]
        v = qkv[:, :, 2 * D + h * hd:2 * D + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (BN, T, T)
        p = jnp.exp(jnp.clip(s, -_CLAMP, _CLAMP)).astype(jnp.bfloat16)
        v_aug = jnp.concatenate([v, ones], axis=2)
        acc = jax.lax.dot_general(
            p, v_aug, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        head_outs.append(
            (acc[:, :, :hd] / acc[:, :, -1:]).astype(jnp.bfloat16))
    a = jnp.concatenate(head_outs, axis=2).reshape(BN * T, D)

    proj = jax.lax.dot_general(
        a, wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    proj = (proj + bproj_ref[0]).astype(jnp.bfloat16)
    fc = jax.lax.dot_general(
        proj, wfc_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    fc = (fc + bfc_ref[0]).reshape(BN, T, D)
    fc = jnp.swapaxes(fc, 0, 1)  # back to frame-major (T, BN, D)
    o_ref[0, :, 0] = (x_ref[0, :, 0] + fc.astype(x_ref.dtype)).astype(
        o_ref.dtype)


def fused_temporal_phase_tm(p_norm, p_attn, p_fc, x: jnp.ndarray,
                            num_heads: int, block_n: int = 0) -> jnp.ndarray:
    """Temporal half of the divided block over FRAME-MAJOR grid tokens:
    x (B, T, N, D) -> x + temporal_fc(MHSA_over_T(LN(x))), values equal to
    fused_temporal_phase on the transposed layout. The position-major view
    attention needs exists only in VMEM, so the glue-free forward keeps ONE
    HBM layout for the entire block stack (VERDICT r2 next-#1)."""
    B, T, N, D = x.shape
    if not block_n:
        block_n = max(1, min(N, 512 // T))
    while N % block_n:
        block_n -= 1
    nb = N // block_n
    # (B, T, nb, bn, D) view — a free reshape — so the block's last two
    # dims (bn, D) cover their array dims in full, which Mosaic's block
    # rules require (bn is rarely 8-divisible: N = 196 = 4 * 49)
    x5 = x.reshape(B, T, nb, block_n, D)

    g = p_norm["scale"].astype(jnp.float32).reshape(1, D)
    b = p_norm["bias"].astype(jnp.float32).reshape(1, D)
    wqkv = p_attn["qkv"]["kernel"].astype(jnp.bfloat16)
    bqkv = p_attn["qkv"].get("bias")
    bqkv = (jnp.zeros((3 * D,)) if bqkv is None else bqkv).astype(
        jnp.float32).reshape(1, 3 * D)
    wproj = p_attn["proj"]["kernel"].astype(jnp.bfloat16)
    bproj = p_attn["proj"]["bias"].astype(jnp.float32).reshape(1, D)
    wfc = p_fc["kernel"].astype(jnp.bfloat16)
    bfc = p_fc["bias"].astype(jnp.float32).reshape(1, D)

    x_spec = pl.BlockSpec((1, T, 1, block_n, D),
                          lambda bi, ni: (bi, 0, ni, 0, 0),
                          memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(shape, lambda bi, ni: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_temporal_phase_tm_kernel, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((B, T, nb, block_n, D), x.dtype),
        grid=(B, nb),
        in_specs=[x_spec, full(1, D), full(1, D), full(D, 3 * D),
                  full(1, 3 * D), full(D, D), full(1, D), full(D, D),
                  full(1, D)],
        out_specs=x_spec,
        cost_estimate=pl.CostEstimate(
            flops=B * N * T * (10 * D * D + 4 * T * D),
            bytes_accessed=2 * B * T * N * D * x.dtype.itemsize,
            transcendentals=B * N * T * T,
        ),
        interpret=_interpret(),
    )(x5, g, b, wqkv, bqkv, wproj, bproj, wfc, bfc)
    return out.reshape(B, T, N, D)


# ---------------------------------------------------------------------------
# Fused MLP phase: out = fc2(gelu(fc1(layer_norm(x))))
# ---------------------------------------------------------------------------

def _mlp_phase_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      o_ref, *, residual: bool):
    M, D = x_ref.shape
    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + _LN_EPS)
    y = (y * g_ref[0] + b_ref[0]).astype(jnp.bfloat16)

    h = jax.lax.dot_general(
        y, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = h + b1_ref[0]
    # tanh-GELU: Mosaic lowers neither erf nor erfc; the tanh form deviates
    # from the exact erf GELU by <~1e-3 absolute — below bf16 resolution at
    # activation scale (this kernel serves the bf16 inference path only)
    c = 0.7978845608028654  # sqrt(2/pi)
    h = (0.5 * h * (1.0 + jnp.tanh(c * (h + 0.044715 * h * h * h))))
    h = h.astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        h, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = (out + b2_ref[0]).astype(o_ref.dtype)
    if residual:
        out = x_ref[:] + out
    o_ref[:] = out


def fused_mlp_phase(p_norm, p_mlp, x: jnp.ndarray,
                    block_m: int = 512, residual: bool = False) -> jnp.ndarray:
    """Pallas twin of models.timesformer.mlp_phase over flattened tokens
    (``residual=True`` gives the mlp_phase_res twin: x + MLP(LN(x)), the
    residual add riding the same VMEM residency).

    x (..., D): internally reshaped to (M, D) and tiled by ``block_m``
    token rows (the grid handles a ragged tail by block clamping)."""
    shape = x.shape
    D = shape[-1]
    Dh = p_mlp["fc1"]["kernel"].shape[1]
    xm = x.reshape(-1, D)
    M = xm.shape[0]
    block_m = min(block_m, max(8, M))  # e.g. the split-carry CLS row (M=B)

    g = p_norm["scale"].astype(jnp.float32).reshape(1, D)
    b = p_norm["bias"].astype(jnp.float32).reshape(1, D)
    w1 = p_mlp["fc1"]["kernel"].astype(jnp.bfloat16)
    b1 = p_mlp["fc1"]["bias"].astype(jnp.float32).reshape(1, Dh)
    w2 = p_mlp["fc2"]["kernel"].astype(jnp.bfloat16)
    b2 = p_mlp["fc2"]["bias"].astype(jnp.float32).reshape(1, D)

    x_spec = pl.BlockSpec((block_m, D), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    full = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                   memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mlp_phase_kernel, residual=residual),
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
        grid=(pl.cdiv(M, block_m),),
        in_specs=[x_spec, full(1, D), full(1, D), full(D, Dh),
                  full(1, Dh), full(Dh, D), full(1, D)],
        out_specs=x_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * M * D * Dh,
            bytes_accessed=2 * M * D * x.dtype.itemsize,
            transcendentals=M * Dh,
        ),
        interpret=_interpret(),
    )(xm, g, b, w1, b1, w2, b2)
    return out.reshape(shape)


