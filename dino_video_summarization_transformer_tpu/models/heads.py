"""Projection heads and probes (ref: vision_transformer.py:248-345,
eval_linear.py:306-320).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .timesformer import _linear_init, linear


def init_dino_head(
    rng: jax.Array,
    in_dim: int,
    out_dim: int,
    nlayers: int = 3,
    hidden_dim: int = 2048,
    bottleneck_dim: int = 256,
) -> Dict[str, Any]:
    """DINOHead params (ref: vision_transformer.py:248-270).

    Weight-norm last layer is stored as (weight_g, weight_v) with weight_g
    initialized to 1 (and typically frozen, ``norm_last_layer=True``).
    """
    nlayers = max(nlayers, 1)
    keys = jax.random.split(rng, nlayers + 1)
    mlp = {}
    if nlayers == 1:
        mlp["fc0"] = _linear_init(keys[0], in_dim, bottleneck_dim)
    else:
        dims = [in_dim] + [hidden_dim] * (nlayers - 1) + [bottleneck_dim]
        for i in range(nlayers):
            mlp[f"fc{i}"] = _linear_init(keys[i], dims[i], dims[i + 1])
    v = _linear_init(keys[-1], bottleneck_dim, out_dim, bias=False)["kernel"]
    return {
        "mlp": mlp,
        "last_layer": {"weight_g": jnp.ones((out_dim,)), "weight_v": v},
    }


def dino_head_forward(params: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    """(ref: vision_transformer.py:278-282)."""
    n = len(params["mlp"])
    for i in range(n):
        x = linear(params["mlp"][f"fc{i}"], x)
        if i < n - 1:
            x = jax.nn.gelu(x, approximate=False)
    # L2 normalize
    x = x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    # weight-normed last layer: W = g * v / ||v||, columns of v are per-output
    v = params["last_layer"]["weight_v"]  # (bottleneck, out)
    g = params["last_layer"]["weight_g"]  # (out,)
    vn = jnp.linalg.norm(v, axis=0)  # (out,)
    w = v * (g / jnp.clip(vn, 1e-12))
    return x @ w.astype(x.dtype)


def init_multi_dino_head(rng, in_dim, out_dim, nlayers=3, hidden_dim=2048, bottleneck_dim=256):
    """Two-token dual head (ref: vision_transformer.py:285-327)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    main = init_dino_head(k1, in_dim, out_dim, nlayers, hidden_dim, bottleneck_dim)
    aux = init_dino_head(k2, in_dim, out_dim, nlayers, hidden_dim, bottleneck_dim)
    return {
        "mlp": main["mlp"],
        "aux_mlp": aux["mlp"],
        "last_layer": main["last_layer"],
        "aux_last_layer": aux["last_layer"],
    }


def multi_dino_head_forward(params, x_pair):
    """(ref: vision_transformer.py:335-345)."""
    rgb = dino_head_forward(
        {"mlp": params["mlp"], "last_layer": params["last_layer"]}, x_pair[0]
    )
    aux = dino_head_forward(
        {"mlp": params["aux_mlp"], "last_layer": params["aux_last_layer"]}, x_pair[1]
    )
    return rgb, aux


def init_linear_classifier(rng, dim: int, num_labels: int) -> Dict[str, Any]:
    """Linear probe; weights N(0, 0.01), zero bias (ref: eval_linear.py:306-316).

    Note the reference hardcodes in_dim=768 and ignores its ``dim`` arg
    (known defect, SURVEY.md section 7); here ``dim`` is honored.
    """
    k = jax.random.split(rng, 1)[0]
    return {
        "kernel": 0.01 * jax.random.normal(k, (dim, num_labels)),
        "bias": jnp.zeros((num_labels,)),
    }


def linear_classifier_forward(params, x):
    x = x.reshape(x.shape[0], -1)
    return linear(params, x)
