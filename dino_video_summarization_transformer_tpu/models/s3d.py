"""S3D separable-3D CNN, TPU-native (ref: models/s3d.py:9-219).

Used for optional CNN distillation during SSL training
(ref: train_ssl.py:263-277). Functional JAX: conv3d via
``lax.conv_general_dilated`` in NDHWC layout (channels-last for TPU),
BatchNorm with explicit (mean, var) state — inference uses running stats;
training returns updated stats (cross-chip sync via jnp means under a
sharded jit, the SyncBatchNorm equivalent, ref: train_ssl.py:274).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# SepInception output plans (ref: models/s3d.py:163-198)
_INCEPTION_PLAN = {
    "Mixed_3b": (192, [64, 96, 128, 16, 32, 32]),
    "Mixed_3c": (256, [128, 128, 192, 32, 96, 64]),
    "Mixed_4b": (480, [192, 96, 208, 16, 48, 64]),
    "Mixed_4c": (512, [160, 112, 224, 24, 64, 64]),
    "Mixed_4d": (512, [128, 128, 256, 24, 64, 64]),
    "Mixed_4e": (512, [112, 144, 288, 32, 64, 64]),
    "Mixed_4f": (528, [256, 160, 320, 32, 128, 128]),
    "Mixed_5b": (832, [256, 160, 320, 32, 128, 128]),
    "Mixed_5c": (832, [384, 192, 384, 48, 128, 128]),
}


def _conv_init(key, cin, cout, k3):
    # reference inits conv weights N(0, 0.01) (ref: models/s3d.py:21)
    kt, kh, kw = k3
    return 0.01 * jax.random.normal(key, (kt, kh, kw, cin, cout))


def _bn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def conv3d(x, w, stride, padding):
    """x NDHWC, w (kt,kh,kw,cin,cout)."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def batch_norm(p, x, training=False, momentum=0.1, eps=1e-5):
    """torch BatchNorm3d semantics. Returns (y, new_stats)."""
    if training:
        axes = (0, 1, 2, 3)
        mean = jnp.mean(x, axes)
        var = jnp.var(x, axes)
        n = x.size / x.shape[-1]
        new_stats = {
            "mean": (1 - momentum) * p["mean"] + momentum * mean,
            "var": (1 - momentum) * p["var"] + momentum * var * n / max(n - 1, 1),
        }
    else:
        mean, var = p["mean"], p["var"]
        new_stats = None
    y = (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return y, new_stats


def max_pool3d(x, kernel, stride, padding):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, *kernel, 1),
        window_strides=(1, *stride, 1),
        padding=((0, 0), *[(p, p) for p in padding], (0, 0)))


def _init_basic(key, cin, cout, k, s, p):
    return {"conv": _conv_init(key, cin, cout, (k, k, k)), "bn": _bn_init(cout),
            "_meta": np.array([k, s, p])}


def _init_st(key, cin, cout, k, s, p, t_stride=None):
    k1, k2 = jax.random.split(key)
    ts = t_stride if t_stride is not None else s
    return {
        "conv1": _conv_init(k1, cin, cout, (1, k, k)),
        "conv2": _conv_init(k2, cout, cout, (k, 1, 1)),
        "bn1": _bn_init(cout), "bn2": _bn_init(cout),
        "_meta": np.array([k, s, p, ts]),
    }


def _apply_basic(p, x, training):
    k, s, pad = int(p["_meta"][0]), int(p["_meta"][1]), int(p["_meta"][2])
    x = conv3d(x, p["conv"], (s, s, s), (pad, pad, pad))
    x, _ = batch_norm(p["bn"], x, training)
    return jax.nn.relu(x)


def _apply_st(p, x, training):
    k, s, pad, ts = [int(v) for v in p["_meta"]]
    x = conv3d(x, p["conv1"], (1, s, s), (0, pad, pad))
    x, _ = batch_norm(p["bn1"], x, training)
    x = jax.nn.relu(x)
    x = conv3d(x, p["conv2"], (ts, 1, 1), (pad, 0, 0))
    x, _ = batch_norm(p["bn2"], x, training)
    return jax.nn.relu(x)


def _init_inception(key, cin, plan, gating=False):
    keys = jax.random.split(key, 8)
    o0, o1a, o1b, o2a, o2b, o3b = plan
    p = {
        "branch0": _init_basic(keys[0], cin, o0, 1, 1, 0),
        "branch1a": _init_basic(keys[1], cin, o1a, 1, 1, 0),
        "branch1b": _init_st(keys[2], o1a, o1b, 3, 1, 1),
        "branch2a": _init_basic(keys[3], cin, o2a, 1, 1, 0),
        "branch2b": _init_st(keys[4], o2a, o2b, 3, 1, 1),
        "branch3b": _init_basic(keys[5], cin, o3b, 1, 1, 0),
    }
    if gating:
        from .timesformer import _linear_init

        for i, c in zip("0123", (o0, o1b, o2b, o3b)):
            p[f"gating_b{i}"] = _linear_init(keys[6], c, c)
    return p


def _self_gate(p, x):
    """(ref: models/s3d.py:70-79)."""
    from .timesformer import linear

    avg = jnp.mean(x, axis=(1, 2, 3))
    w = jax.nn.sigmoid(linear(p, avg))
    return w[:, None, None, None, :] * x


def _apply_inception(p, x, training, gating):
    x0 = _apply_basic(p["branch0"], x, training)
    x1 = _apply_st(p["branch1b"], _apply_basic(p["branch1a"], x, training), training)
    x2 = _apply_st(p["branch2b"], _apply_basic(p["branch2a"], x, training), training)
    x3 = _apply_basic(p["branch3b"], max_pool3d(x, (3, 3, 3), (1, 1, 1), (1, 1, 1)),
                      training)
    if gating:
        x0 = _self_gate(p["gating_b0"], x0)
        x1 = _self_gate(p["gating_b1"], x1)
        x2 = _self_gate(p["gating_b2"], x2)
        x3 = _self_gate(p["gating_b3"], x3)
    return jnp.concatenate([x0, x1, x2, x3], axis=-1)


def init_s3d(rng: jax.Array, input_channel: int = 3, gating: bool = False,
             slow: bool = False) -> Dict[str, Any]:
    """(ref: models/s3d.py:138-202)."""
    keys = jax.random.split(rng, 16)
    p: Dict[str, Any] = {
        "Conv_1a": _init_st(keys[0], input_channel, 64, 7, 2, 3,
                            t_stride=1 if slow else 2),
        "Conv_2b": _init_basic(keys[1], 64, 64, 1, 1, 0),
        "Conv_2c": _init_st(keys[2], 64, 192, 3, 1, 1),
    }
    for i, name in enumerate(_INCEPTION_PLAN):
        cin, plan = _INCEPTION_PLAN[name]
        p[name] = _init_inception(keys[3 + i], cin, plan, gating)
    return p


def forward(params, x: jnp.ndarray, training: bool = False,
            gating: bool = False, compute_dtype=jnp.float32) -> jnp.ndarray:
    """(ref: models/s3d.py:212-219). x (B, C, T, H, W) for API parity;
    returns (B, 1024, T', H', W') channels-first like the reference."""
    x = x.astype(compute_dtype).transpose(0, 2, 3, 4, 1)  # NDHWC
    x = _apply_st(params["Conv_1a"], x, training)
    x = max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
    x = _apply_basic(params["Conv_2b"], x, training)
    x = _apply_st(params["Conv_2c"], x, training)
    x = max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
    x = _apply_inception(params["Mixed_3b"], x, training, gating)
    x = _apply_inception(params["Mixed_3c"], x, training, gating)
    x = max_pool3d(x, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
        x = _apply_inception(params[name], x, training, gating)
    x = max_pool3d(x, (2, 2, 2), (2, 2, 2), (0, 0, 0))
    x = _apply_inception(params["Mixed_5b"], x, training, gating)
    x = _apply_inception(params["Mixed_5c"], x, training, gating)
    return x.transpose(0, 4, 1, 2, 3)  # back to NCDHW


def s3d_to_pytree(sd) -> Dict[str, Any]:
    """CoCLR-style torch state_dict -> pytree. Conv3d weight
    (cout,cin,kt,kh,kw) -> (kt,kh,kw,cin,cout)."""
    import re

    sd = {k: np.asarray(v) for k, v in sd.items()}

    def conv(prefix):
        return sd[prefix + ".weight"].transpose(2, 3, 4, 1, 0)

    def bn(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"],
                "mean": sd[prefix + ".running_mean"],
                "var": sd[prefix + ".running_var"]}

    out: Dict[str, Any] = {}
    for key in list(sd.keys()):
        m = re.match(r"^(Conv_\w+|Mixed_\w+)\.", key)
        if not m:
            continue
        name = m.group(1)
        if name in out:
            continue
        if name == "Conv_1a" or name in ("Conv_2c",):
            out[name] = {"conv1": conv(f"{name}.conv1"), "conv2": conv(f"{name}.conv2"),
                         "bn1": bn(f"{name}.bn1"), "bn2": bn(f"{name}.bn2"),
                         "_meta": np.array([7, 2, 3, 2]) if name == "Conv_1a"
                         else np.array([3, 1, 1, 1])}
        elif name == "Conv_2b":
            out[name] = {"conv": conv(f"{name}.conv"), "bn": bn(f"{name}.bn"),
                         "_meta": np.array([1, 1, 0])}
        else:  # Mixed_*: branches are Sequential indices
            cin, plan = _INCEPTION_PLAN[name]
            out[name] = {
                "branch0": {"conv": conv(f"{name}.branch0.0.conv"),
                            "bn": bn(f"{name}.branch0.0.bn"),
                            "_meta": np.array([1, 1, 0])},
                "branch1a": {"conv": conv(f"{name}.branch1.0.conv"),
                             "bn": bn(f"{name}.branch1.0.bn"),
                             "_meta": np.array([1, 1, 0])},
                "branch1b": {"conv1": conv(f"{name}.branch1.1.conv1"),
                             "conv2": conv(f"{name}.branch1.1.conv2"),
                             "bn1": bn(f"{name}.branch1.1.bn1"),
                             "bn2": bn(f"{name}.branch1.1.bn2"),
                             "_meta": np.array([3, 1, 1, 1])},
                "branch2a": {"conv": conv(f"{name}.branch2.0.conv"),
                             "bn": bn(f"{name}.branch2.0.bn"),
                             "_meta": np.array([1, 1, 0])},
                "branch2b": {"conv1": conv(f"{name}.branch2.1.conv1"),
                             "conv2": conv(f"{name}.branch2.1.conv2"),
                             "bn1": bn(f"{name}.branch2.1.bn1"),
                             "bn2": bn(f"{name}.branch2.1.bn2"),
                             "_meta": np.array([3, 1, 1, 1])},
                "branch3b": {"conv": conv(f"{name}.branch3.1.conv"),
                             "bn": bn(f"{name}.branch3.1.bn"),
                             "_meta": np.array([1, 1, 0])},
            }
    return out
