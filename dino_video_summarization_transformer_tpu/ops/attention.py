"""Fused multi-head attention, Pallas/TPU.

The divided space-time attention's hot ops are many short-sequence
attentions (spatial L=197, temporal L<=96; head_dim 64). Measured on the
bench chip (tools/attn_bench*.py), the XLA path is memory-bound, not
MXU-bound: the (B*H, L, L) score tensor makes three HBM round trips
(QK^T write, softmax read/write, PV read) and the softmax reduces across
the lane dimension — cross-lane max/sum reductions are the slow direction
on the VPU. Tile-aligning or sequence-packing the XLA einsums makes things
WORSE (more bytes, same reductions).

This kernel eliminates both costs:

* scores never leave VMEM (one HBM pass for q/k/v, one write for out);
* the softmax is computed WITHOUT any cross-lane reduction:
  - no max subtraction — scores are clamped to +/-CLAMP and exponentiated
    in float32, whose range (exp(+/-80) well inside f32) makes the
    stabilizing max shift unnecessary: softmax is shift-invariant, so
    clamping changes results only when |s| > 80 pre-softmax, where the
    output is saturated anyway (|s| <= |q||k|/8, far below 80 for
    LayerNormed inputs);
  - the denominator comes from the MXU: V is augmented with a ones
    column, so P @ [V | 1] yields numerator and row-sum in one matmul
    (the lane padding 64->128 was being paid anyway).
* temporal sequences (L=30) are packed G per score matrix with a
  block-diagonal mask applied to exp(P) (exact: masked terms are zeroed
  before both the numerator and the MXU-computed denominator).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CLAMP = 80.0


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, pack: int,
                 seq_len: int):
    """One block of BB sequences; per-sequence 2D dots.

    q/k (BB, L, hd) bf16; v (BB, L, HDP) bf16 with v[..., hd] == 1.0 (ones
    column) and zeros beyond; o (BB, L, HDP). L = pack * seq_len with
    block-diagonal masking between the packed sequences.
    """
    BB, L, hd = q_ref.shape
    if pack > 1:
        row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0) // seq_len
        col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1) // seq_len
        mask = (row == col).astype(jnp.float32)

    # unrolled python loop — BB is small and static; unrolling lets Mosaic
    # software-pipeline the per-sequence MXU ops
    for i in range(BB):
        q = q_ref[i]
        k = k_ref[i]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        p = jnp.exp(jnp.clip(s, -_CLAMP, _CLAMP))
        if pack > 1:
            p = p * mask
        acc = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (L, HDP)
        denom = acc[:, -1:]  # MXU row-sum via the ones column
        o_ref[i] = (acc / denom).astype(o_ref.dtype)


def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float, block_b: int = 8,
                    pack: int = 1) -> jnp.ndarray:
    """softmax(q k^T * scale) v over (B, L, hd) batched head-sequences.

    ``pack`` > 1 treats each row as ``pack`` independent sequences of
    length L/pack (block-diagonal masking) — callers pack tiny temporal
    sequences into MXU-sized score tiles. Returns (B, L, hd).
    """
    B, L, hd = q.shape
    seq_len = L // max(pack, 1)
    HDP = -(-(hd + 1) // 128) * 128  # room for the ones columns, lane-aligned
    # v augmented with ones columns up to HDP lanes: every padded output
    # column then holds the row-sum (the softmax denominator), so the
    # kernel reads it from the last lane
    ones = jnp.ones((B, L, HDP - hd), v.dtype)
    v_aug = jnp.concatenate([v, ones], axis=-1)

    padb = (-B) % block_b
    if padb:
        q = jnp.pad(q, ((0, padb), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, padb), (0, 0), (0, 0)))
        v_aug = jnp.pad(v_aug, ((0, padb), (0, 0), (0, 0)))
    Bp = B + padb

    qk_spec = pl.BlockSpec((block_b, L, hd), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((block_b, L, HDP), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, pack=max(pack, 1),
                          seq_len=seq_len),
        out_shape=jax.ShapeDtypeStruct((Bp, L, HDP), q.dtype),
        grid=(Bp // block_b,),
        in_specs=[qk_spec, qk_spec, v_spec],
        out_specs=v_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * Bp * L * L * hd,
            bytes_accessed=4 * Bp * L * hd * q.dtype.itemsize,
            transcendentals=Bp * L * L,
        ),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v_aug)
    return out[:B, :, :hd]


def mhsa_pallas(p, x: jnp.ndarray, num_heads: int,
                block_b: int = 8) -> jnp.ndarray:
    """Drop-in replacement for models.timesformer.mhsa on TPU.

    x (B, N, C); qkv/proj weights from the standard param dict. Sequences
    of length <= 48 are packed 4-per-score-tile (block-diagonal).
    """
    from ..models.timesformer import linear

    B, N, C = x.shape
    H = num_heads
    hd = C // H
    scale = hd ** -0.5
    qkv = linear(p["qkv"], x).reshape(B, N, 3, H, hd)
    # (B, N, 3, H, hd) -> (3, B*H, N, hd)
    qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, B * H, N, hd)
    q, k, v = qkv[0], qkv[1], qkv[2]

    BH = B * H
    pack = 1
    if N <= 48 and BH % 4 == 0:
        pack = 4
        q = q.reshape(BH // 4, 4 * N, hd)
        k = k.reshape(BH // 4, 4 * N, hd)
        v = v.reshape(BH // 4, 4 * N, hd)

    out = fused_attention(q, k, v, scale, block_b=block_b, pack=pack)
    if pack > 1:
        out = out.reshape(BH, N, hd)
    out = out.reshape(B, H, N, hd).transpose(0, 2, 1, 3).reshape(B, N, C)
    return linear(p["proj"], out)


def attention_logit_margin(params, x, cfg, compute_dtype=jnp.float32):
    """Largest pre-softmax |score| over every attention call of a forward.

    Debug check for the max-free softmax above: the kernel clamps scores to
    +/-_CLAMP instead of subtracting the row max, which is exact only while
    |s| < _CLAMP. Run this against any newly converted real checkpoint
    (trained logits grow far beyond random-init scale); a margin approaching
    _CLAMP means the fused kernels would silently equalize saturated rows
    and the model must use the XLA path instead. Returns max |s|; compare
    against ``clamp_value()``.
    """
    from ..models import timesformer as tsf

    maxes = []
    orig = tsf.mhsa

    def recording_mhsa(p, xx, num_heads, deterministic=True):
        B, N, C = xx.shape
        hd = C // num_heads
        qkv = tsf.linear(p["qkv"], xx).reshape(B, N, 3, num_heads, hd)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                       preferred_element_type=jnp.float32) * hd ** -0.5
        # debug.callback: works under jit/scan (the block loop is a
        # lax.scan), delivering the concrete max at run time
        jax.debug.callback(lambda m: maxes.append(float(m)),
                           jnp.max(jnp.abs(s)))
        return orig(p, xx, num_heads, deterministic)

    tsf.mhsa = recording_mhsa
    try:
        tsf.forward(params, x, cfg, compute_dtype=compute_dtype)
    finally:
        tsf.mhsa = orig
    return max(maxes)


def clamp_value() -> float:
    return _CLAMP


def use_pallas_attention(enable: bool = True) -> None:
    """Globally swap the TimeSformer's attention implementation.

    Inference engines flip this on for TPU runs; tests/CPU keep the XLA
    path (Pallas TPU kernels don't run on the CPU backend).
    """
    from ..models import timesformer as tsf

    if enable:
        if not hasattr(tsf, "_mhsa_xla"):
            tsf._mhsa_xla = tsf.mhsa

        def mhsa_dispatch(p, x, num_heads, deterministic=True):
            return mhsa_pallas(p, x, num_heads)

        tsf.mhsa = mhsa_dispatch
    else:
        if hasattr(tsf, "_mhsa_xla"):
            tsf.mhsa = tsf._mhsa_xla
