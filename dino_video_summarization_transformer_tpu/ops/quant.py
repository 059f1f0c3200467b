"""Int8 quantization for the dense layers (the MXU's 2x tier).

The v5e MXU runs s8 x s8 -> s32 at twice the bf16 rate (measured on this
chip: 247 vs 137 TFLOP/s at 8192^3 — tools notes in BENCH.md). The
scoring pipeline's teacher pass is ~80% of its FLOPs even at stride 8,
so a quantized teacher is the one remaining hardware lever after the
bf16 whole-block kernels (94-96 TFLOP/s, measured flat across block
choices).

Scheme (standard W8A8 dynamic PTQ for ViTs):
* weights: symmetric per-output-channel int8, quantized ONCE from the
  original-precision tree (`quantize_tree_int8`), stored as
  ``qkernel`` (int8) + ``qscale`` (f32, per fan_out) in place of
  ``kernel`` — the quantization travels WITH the params tree, so
  `models.timesformer.linear` dispatches on the key and no call site
  changes (the same pattern as the per-model ``use_fused`` flag).
* activations: symmetric per-token (per-row) dynamic int8 — max|x| over
  the feature axis per token, no calibration pass needed.
* attention score/PV einsums, LayerNorm, softmax, GELU stay in the
  activation dtype / f32: they are ~4% of the FLOPs and the known
  quality cliffs of fully-quantized attention are not worth it.
* patch_embed and the classifier head are left unquantized (input /
  output layers; standard PTQ practice and <1% of FLOPs).

Quality is validated exactly like every other speed tier — composite
rel-err vs the f32 oracle across the live validator configs against the
bf16 noise floor (tools/validate_fast_scoring.py) — before any mode
ships a default. Ref protocol being approximated: the teacher forward of
/root/reference/dino_similarity.py:82-84.
"""

from typing import Optional

import jax
import jax.numpy as jnp

# dense params dicts eligible for quantization inside a block
_BLOCK_DENSE = (
    ("attn", "qkv"), ("attn", "proj"),
    ("temporal_attn", "qkv"), ("temporal_attn", "proj"),
    ("mlp", "fc1"), ("mlp", "fc2"),
    ("temporal_fc",),
)


def quantize_dense(p: dict) -> dict:
    """{"kernel" (..., K, F), "bias"?} -> {"qkernel" int8, "qscale" f32
    (..., F), "bias"?}: symmetric per-output-channel weight quantization.

    Leading axes (the stacked block depth) are preserved; the scale is
    computed over the fan_in axis only, so each (layer, out_channel)
    pair gets its own scale.
    """
    w = jnp.asarray(p["kernel"], jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-2)  # (..., F)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale[..., None, :]), -127, 127).astype(jnp.int8)
    out = {"qkernel": q, "qscale": scale}
    if "bias" in p:
        out["bias"] = jnp.asarray(p["bias"], jnp.float32)
    return out


def _get_path(tree, path):
    for k in path:
        if k not in tree:
            return None
        tree = tree[k]
    return tree


def _set_path(tree, path, value):
    for k in path[:-1]:
        tree = tree[k]
    tree[path[-1]] = value


def quantize_tree_int8(params) -> dict:
    """Quantize a TimeSformer params tree's block dense layers to int8.

    Returns a new tree (shallow-copied dicts; non-dense leaves shared)
    where every block dense layer carries qkernel/qscale instead of
    kernel. patch_embed / head / embeddings / norms are untouched.
    """

    def copy(t):
        return {k: copy(v) if isinstance(v, dict) else v for k, v in t.items()}

    out = copy(params)
    blocks = out.get("blocks")
    if blocks is None:
        raise ValueError("params tree has no 'blocks'")
    for path in _BLOCK_DENSE:
        p = _get_path(blocks, path)
        if p is not None and "kernel" in p:
            _set_path(blocks, path, quantize_dense(p))
    return out


def is_quantized(p: dict) -> bool:
    return isinstance(p, dict) and "qkernel" in p


def int8_linear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """y = dequant(quant_row(x) @ qkernel) + bias.

    Per-token symmetric dynamic activation quantization; the matmul runs
    s8 x s8 -> s32 on the MXU (exact integer arithmetic), then one fused
    rescale by (row_scale x channel_scale). Output in x.dtype.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127)
    xq = xq.astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, p["qkernel"],
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * sx * p["qscale"]
    if "bias" in p:
        y = y + p["bias"]
    return y.astype(x.dtype)


def dequantize_dense(p: dict) -> dict:
    """Inverse of quantize_dense (up to quantization error): rebuilds a
    float kernel for paths that cannot consume qkernel (tests, fallback)."""
    w = p["qkernel"].astype(jnp.float32) * p["qscale"][..., None, :]
    out = {"kernel": w}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out
