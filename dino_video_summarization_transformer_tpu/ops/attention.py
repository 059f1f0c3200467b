"""Fused multi-head attention, Pallas/TPU.

The divided space-time attention's hot ops are many short-sequence
attentions (spatial N=197, temporal N<=96; head_dim 64). XLA materializes
the (B, H, N, N) score tensor in HBM between the QK^T, softmax and PV steps
— measured at ~60% of the TimeSformer forward. This kernel keeps a block of
whole (N, N) score matrices in VMEM: one pass over HBM for q/k/v, one write
for the output.

Sequences here are tiny (<=~200), so no online-softmax streaming is needed
— a block of full score matrices fits VMEM comfortably (flash-attention's
tiling machinery would only add overhead at these sizes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[:]  # (BB, N, hd)
    k = k_ref[:]
    v = v_ref[:]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # (BB, N, N)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[:] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float, block_b: int = 16) -> jnp.ndarray:
    """softmax(q k^T * scale) v over (B, N, hd) batched heads.

    B is the flattened batch*heads dim; grid tiles it by ``block_b``.
    Inputs padded on the batch dim to a block multiple by the caller.
    """
    B, N, hd = q.shape
    assert B % block_b == 0, (B, block_b)
    grid = (B // block_b,)
    spec = pl.BlockSpec((block_b, N, hd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, N, hd), q.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * N * N * hd,
            bytes_accessed=4 * B * N * hd * q.dtype.itemsize,
            transcendentals=B * N * N,
        ),
    )(q, k, v)


def mhsa_pallas(p, x: jnp.ndarray, num_heads: int, block_b: int = 16) -> jnp.ndarray:
    """Drop-in replacement for models.timesformer.mhsa on TPU.

    x (B, N, C); qkv/proj weights from the standard param dict.
    """
    from ..models.timesformer import linear

    B, N, C = x.shape
    H = num_heads
    hd = C // H
    qkv = linear(p["qkv"], x).reshape(B, N, 3, H, hd)
    # (B, N, 3, H, hd) -> (3, B*H, N, hd)
    qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, B * H, N, hd)
    q, k, v = qkv[0], qkv[1], qkv[2]

    BH = B * H
    pad = (-BH) % block_b
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
    out = fused_attention(q, k, v, hd ** -0.5, block_b=block_b)
    out = out[:BH].reshape(B, H, N, hd).transpose(0, 2, 1, 3).reshape(B, N, C)
    return linear(p["proj"], out)


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
