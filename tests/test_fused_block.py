"""Fused block-phase Pallas kernels (ops/fused_block.py), run in Pallas
interpreter mode on the CPU backend — numerically the same code path the
TPU executes (modulo Mosaic codegen), checked against the XLA phases."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from dino_video_summarization_transformer_tpu.models import timesformer as tsf
from dino_video_summarization_transformer_tpu.ops import fused_block as fb
from dino_video_summarization_transformer_tpu.ops.attention import (
    fused_attention)


def _attn_params(key, D):
    k1, k2 = jax.random.split(key)
    return (
        {"scale": jnp.ones((D,)) + 0.1, "bias": jnp.zeros((D,)) + 0.05},
        {
            "qkv": {"kernel": 0.1 * jax.random.normal(k1, (D, 3 * D)),
                    "bias": jnp.zeros((3 * D,)) + 0.01},
            "proj": {"kernel": 0.1 * jax.random.normal(k2, (D, D)),
                     "bias": jnp.zeros((D,)) + 0.02},
        },
    )


@pytest.mark.parametrize("S,L,D,H", [(6, 9, 64, 2), (4, 5, 96, 3)])
def test_fused_attn_phase_matches_xla(S, L, D, H):
    pn, pa = _attn_params(jax.random.key(0), D)
    x = jax.random.normal(jax.random.key(1), (S, L, D), jnp.bfloat16)
    want = np.asarray(tsf.attn_phase(pn, pa, x.astype(jnp.float32), H))
    got = np.asarray(fb.fused_attn_phase(pn, pa, x, H), np.float32)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_fused_mlp_phase_matches_xla_ragged():
    D, Dh = 64, 128
    pn = {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))}
    pm = {
        "fc1": {"kernel": 0.2 * jax.random.normal(jax.random.key(0), (D, Dh)),
                "bias": jnp.zeros((Dh,)) + 0.01},
        "fc2": {"kernel": 0.2 * jax.random.normal(jax.random.key(1), (Dh, D)),
                "bias": jnp.zeros((D,)) - 0.01},
    }
    # M = 3*13 = 39, deliberately not a multiple of the block size
    x = jax.random.normal(jax.random.key(2), (3, 13, D), jnp.bfloat16)
    want = np.asarray(tsf.mlp_phase(pn, pm, x.astype(jnp.float32)))
    got = np.asarray(fb.fused_mlp_phase(pn, pm, x, block_m=16), np.float32)
    # two chained bf16 matmuls accumulate a few ulp beyond one matmul's
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)


def test_fused_dispatch_dtype_aware():
    """use_fused_block routes bf16 through the kernels and f32 through the
    original XLA phases (bit-identical to pre-dispatch output)."""
    D, H = 64, 2
    pn, pa = _attn_params(jax.random.key(3), D)
    x32 = jax.random.normal(jax.random.key(4), (4, 7, D), jnp.float32)
    want32 = np.asarray(tsf.attn_phase(pn, pa, x32, H))
    fb.use_fused_block(True)
    try:
        got32 = np.asarray(tsf.attn_phase(pn, pa, x32, H))
        np.testing.assert_array_equal(got32, want32)
        got16 = np.asarray(
            tsf.attn_phase(pn, pa, x32.astype(jnp.bfloat16), H), np.float32)
        np.testing.assert_allclose(got16, want32, atol=3e-2, rtol=3e-2)
    finally:
        fb.use_fused_block(False)


def test_fused_attention_packed():
    """Standalone fused attention with block-diagonal sequence packing ==
    per-sequence softmax attention."""
    B, L, hd, pack = 4, 12, 32, 3
    sl = L // pack
    mk = lambda s: jax.random.normal(jax.random.key(s), (B, L, hd),
                                     jnp.bfloat16)
    q, k, v = mk(0), mk(1), mk(2)
    got = np.asarray(
        fused_attention(q, k, v, hd ** -0.5, block_b=2, pack=pack),
        np.float32)

    qs = np.asarray(q, np.float32).reshape(B * pack, sl, hd)
    ks = np.asarray(k, np.float32).reshape(B * pack, sl, hd)
    vs = np.asarray(v, np.float32).reshape(B * pack, sl, hd)
    s = np.einsum("bnd,bmd->bnm", qs, ks) * hd ** -0.5
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bnm,bmd->bnd", p, vs).reshape(B, L, hd)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)
