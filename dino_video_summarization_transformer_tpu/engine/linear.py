"""Frozen-backbone linear probe (ref: eval_linear.py:30-320).

The reference runs the frozen backbone under no_grad and trains an SGD
linear head with per-epoch cosine annealing (ref: eval_linear.py:127-133,
182-261). Here the backbone forward and the head train step compile into
one jitted function; the backbone output is stop_gradient'ed.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import timesformer as tsf
from ..models.heads import init_linear_classifier, linear_classifier_forward


class LinearProbeState(NamedTuple):
    head: dict
    opt_state: tuple


def make_linear_probe(
    params_backbone,
    model_cfg: tsf.TimeSformerConfig,
    num_labels: int,
    lr: float,
    epochs: int,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    n_last_blocks: int = 1,
    avgpool: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
):
    """Returns (state, train_step, eval_step, set_epoch_lr).

    lr follows torch CosineAnnealingLR over epochs with eta_min=0
    (ref: eval_linear.py:133).
    """
    rng = rng if rng is not None else jax.random.key(0)
    head = init_linear_classifier(rng, model_cfg.embed_dim, num_labels)
    opt = optax.sgd(learning_rate=1.0, momentum=momentum)  # lr injected per step
    state = LinearProbeState(head=head, opt_state=opt.init(head))

    def features(x):
        f = tsf.forward(params_backbone, x, model_cfg, compute_dtype=compute_dtype)
        return jax.lax.stop_gradient(f.astype(jnp.float32))

    @jax.jit
    def train_step(state: LinearProbeState, x, y, lr_t):
        feats = features(x)

        def loss_fn(head):
            logits = linear_classifier_forward(head, feats)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.head)
        if weight_decay:
            grads = jax.tree.map(lambda g, p: g + weight_decay * p, grads, state.head)
        updates, opt_state = opt.update(grads, state.opt_state, state.head)
        # optax.sgd already emits descent-direction updates; scale by lr only
        updates = jax.tree.map(lambda u: lr_t * u, updates)
        head = optax.apply_updates(state.head, updates)
        return LinearProbeState(head, opt_state), loss

    @jax.jit
    def eval_step(state: LinearProbeState, x):
        feats = features(x)
        return linear_classifier_forward(state.head, feats)

    def epoch_lr(epoch: int) -> float:
        # torch CosineAnnealingLR(optimizer, epochs, eta_min=0)
        return lr * 0.5 * (1 + np.cos(np.pi * epoch / epochs))

    return state, train_step, eval_step, epoch_lr
