"""Optimizers and gradient utilities, optax-native.

Covers the reference's three optimizer choices (AdamW / SGD-momentum / LARS,
ref: train_ssl.py:377-388), the no-weight-decay parameter grouping
(ref: utils/utils.py:612-623), per-parameter gradient clipping
(ref: utils/utils.py:102-111) and last-layer gradient freezing
(ref: utils/utils.py:114-119).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def wd_mask(params) -> Any:
    """True for parameters that receive weight decay: reference excludes
    biases and all 1-D tensors (ref: utils/utils.py:612-623). With stacked
    blocks, per-block 1-D tensors appear as 2-D (depth, dim), so the rule is
    expressed by key name + trailing shape."""

    def mask_fn(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "bias" in names or "scale" in names:
            return False
        # embeddings / cls tokens are 1-D-per-position in torch terms
        if any(n in ("cls_token", "pos_embed", "time_embed", "weight_g") for n in names):
            return False
        return leaf.ndim >= 2

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def per_param_clip(clip: float) -> optax.GradientTransformation:
    """Per-parameter L2-norm clipping: each parameter's gradient is scaled
    independently by clip/(||g||+1e-6) when its own norm exceeds ``clip``
    (ref: utils/utils.py:102-111 — note this is NOT global-norm clipping)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip_one(g):
            norm = jnp.linalg.norm(g.astype(jnp.float32))
            coef = jnp.minimum(clip / (norm + 1e-6), 1.0)
            return (g * coef).astype(g.dtype)

        return jax.tree.map(clip_one, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


class LarsState(NamedTuple):
    mu: Any


def lars(
    momentum: float = 0.9,
    eta: float = 0.001,
) -> optax.GradientTransformation:
    """LARS matching the reference's Barlow-Twins variant
    (ref: utils/utils.py:523-561): weight decay and trust-ratio adaptation
    apply only to parameters with ndim != 1; weight decay is injected via
    ``add_decayed_weights`` upstream, here we do adaptation + momentum.
    The caller must pass params to ``update``.
    """

    def init_fn(params):
        return LarsState(mu=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params):
        assert params is not None

        def adapt(dp, p):
            if p.ndim == 1:
                return dp
            pn = jnp.linalg.norm(p.astype(jnp.float32))
            un = jnp.linalg.norm(dp.astype(jnp.float32))
            q = jnp.where(pn > 0.0, jnp.where(un > 0.0, eta * pn / un, 1.0), 1.0)
            return dp * q

        adapted = jax.tree.map(adapt, updates, params)
        mu = jax.tree.map(lambda m, d: m * momentum + d, state.mu, adapted)
        return mu, LarsState(mu=mu)

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(
    name: str,
    params,
    momentum: float = 0.9,
) -> optax.GradientTransformation:
    """AdamW / SGD / LARS with external lr & wd injection
    (ref: train_ssl.py:377-388). lr and wd are driven per-step via
    ``optax.inject_hyperparams``-style scaling outside, so the transforms
    here use unit lr; weight decay is applied only to the wd_mask subset.
    """
    mask = wd_mask(params)
    if name == "adamw":
        core = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    elif name == "sgd":
        core = optax.trace(decay=momentum, nesterov=False)
    elif name == "lars":
        core = lars(momentum=momentum)
    else:
        raise ValueError(f"unknown optimizer {name}")
    return core, mask


class TrainOptState(NamedTuple):
    inner: Any


def apply_updates_with_schedules(
    params,
    grads,
    opt_state,
    core: optax.GradientTransformation,
    mask,
    lr: jnp.ndarray,
    wd: jnp.ndarray,
    clip: Optional[float] = None,
    freeze_last_layer: Optional[jnp.ndarray] = None,
):
    """One optimizer step with per-step lr/wd and reference clipping order:
    clip -> cancel last layer -> (wd) -> optimizer -> scale by -lr
    (ref: train_ssl.py:534-552).

    ``freeze_last_layer``: traced bool; when True, zero all grads whose path
    contains 'last_layer' (ref: utils/utils.py:114-119).
    """
    if clip is not None:
        clipper = per_param_clip(clip)
        grads, _ = clipper.update(grads, optax.EmptyState())

    # decoupled weight decay on the masked subset (AdamW / SGD / LARS all
    # apply wd additively pre-momentum in the reference)
    grads = jax.tree.map(
        lambda g, p, m: g + wd * p if m else g, grads, params, mask
    )

    if freeze_last_layer is not None:
        # after wd injection: a frozen parameter gets NO update at all — the
        # reference sets p.grad=None and torch optimizers then skip the
        # parameter entirely, weight decay included (ref: utils/utils.py:114-119)

        def cancel(path, g):
            # substring match like the reference's `"last_layer" in n`
            # (ref: utils/utils.py:118) — also catches aux_last_layer
            names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
            if any("last_layer" in n for n in names):
                return jnp.where(freeze_last_layer, jnp.zeros_like(g), g)
            return g

        grads = jax.tree_util.tree_map_with_path(cancel, grads)
    updates, inner = core.update(grads, opt_state, params)
    updates = jax.tree.map(lambda u: -lr * u, updates)
    params = optax.apply_updates(params, updates)
    return params, inner
