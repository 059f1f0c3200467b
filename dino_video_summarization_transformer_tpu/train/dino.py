"""DINO losses and teacher EMA, functional JAX.

Two loss variants exist in the reference and both are reproduced:

* ``scoring_dino_loss`` — the inference-only per-frame loss used by the
  frame-importance scorer: fixed zero center, teacher_temp=0.02,
  student_temp=0.3, applied to raw 768-d CLS features
  (ref: dino_similarity.py:120-135).
* ``dino_loss`` — the full training loss with teacher centering, temperature
  warmup and same-view term skipping (ref: train_ssl.py:602-691). The
  center's batch statistics are reduced with ``psum`` over the data mesh
  axis, replacing the reference's ``dist.all_reduce``
  (ref: train_ssl.py:681-687).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def scoring_dino_loss(
    student_output: jnp.ndarray,
    teacher_output: jnp.ndarray,
    center: Optional[jnp.ndarray] = None,
    teacher_temp: float = 0.02,
    student_temp: float = 0.3,
) -> jnp.ndarray:
    """Per-frame cross-entropy H(p_teacher, p_student).

    Accepts (..., D) and reduces over the last axis only, so a batch of
    frames maps to a batch of losses — the reference's per-frame Python
    loop + ``.item()`` sync (ref: dino_similarity.py:87-88) becomes one
    vectorized op.
    """
    s = student_output.astype(jnp.float32)
    t = teacher_output.astype(jnp.float32)
    if center is not None:
        t = t - center
    p_teacher = jax.nn.softmax(t / teacher_temp, axis=-1)
    logp_student = jax.nn.log_softmax(s / student_temp, axis=-1)
    return -jnp.sum(p_teacher * logp_student, axis=-1)


def teacher_temp_schedule(
    warmup_teacher_temp: float,
    teacher_temp: float,
    warmup_teacher_temp_epochs: int,
    nepochs: int,
) -> np.ndarray:
    """Teacher temperature warmup (ref: train_ssl.py:620-625)."""
    return np.concatenate(
        (
            np.linspace(warmup_teacher_temp, teacher_temp, warmup_teacher_temp_epochs),
            np.ones(max(nepochs - warmup_teacher_temp_epochs, 0)) * teacher_temp,
        )
    )


def dino_loss(
    student_output: jnp.ndarray,
    teacher_output: jnp.ndarray,
    center: jnp.ndarray,
    temp: jnp.ndarray | float,
    n_crops: int,
    global_crops: int = 2,
    student_temp: float = 0.1,
    center_momentum: float = 0.9,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full DINO training loss (ref: train_ssl.py:626-671).

    student_output: (n_crops * B, out_dim) — crops concatenated like
    MultiCropWrapper's output; teacher_output: (global_crops * B, out_dim).
    Returns (scalar loss, updated center). ``axis_name`` names the data mesh
    axis for the centering all-reduce; None for single-device.
    """
    s = student_output.astype(jnp.float32) / student_temp
    t = jax.nn.softmax(
        (teacher_output.astype(jnp.float32) - center) / temp, axis=-1
    )
    t = jax.lax.stop_gradient(t)

    student_chunks = jnp.split(s, n_crops, axis=0)
    teacher_chunks = jnp.split(t, global_crops, axis=0)

    total_loss = 0.0
    n_terms = 0
    for iq, q in enumerate(teacher_chunks):
        for v in range(n_crops):
            if v == iq:
                continue  # skip same-view pairs (ref: train_ssl.py:663-665)
            logp = jax.nn.log_softmax(student_chunks[v], axis=-1)
            total_loss += jnp.mean(jnp.sum(-q * logp, axis=-1))
            n_terms += 1
    total_loss = total_loss / n_terms

    new_center = update_center(
        teacher_output.astype(jnp.float32), center, center_momentum, axis_name
    )
    return total_loss, new_center


def dino_loss_two_token(
    student_pair,
    teacher_pair,
    center: jnp.ndarray,
    temp,
    student_temp: float = 0.1,
    center_momentum: float = 0.9,
    axis_name: Optional[str] = None,
):
    """Two-token DINO loss (ref: train_ssl.py:632-651): 4 student chunks,
    2 teacher chunks per token stream; views 0-1 learn from the main
    teacher's first chunk, views 2-3 from the aux teacher's second chunk.
    center is (2, out_dim); returns (loss, new_center)."""
    s_main = student_pair[0].astype(jnp.float32) / student_temp
    s_aux = student_pair[1].astype(jnp.float32) / student_temp
    t_main = jax.lax.stop_gradient(jax.nn.softmax(
        (teacher_pair[0].astype(jnp.float32) - center[0]) / temp, axis=-1))
    t_aux = jax.lax.stop_gradient(jax.nn.softmax(
        (teacher_pair[1].astype(jnp.float32) - center[1]) / temp, axis=-1))

    s_main_chunks = jnp.split(s_main, 4, axis=0)
    s_aux_chunks = jnp.split(s_aux, 4, axis=0)
    q_main = jnp.split(t_main, 2, axis=0)[0]
    q_aux = jnp.split(t_aux, 2, axis=0)[1]

    total = 0.0
    for iv in range(4):
        if iv < 2:
            q, v = q_main, s_main_chunks[iv]
        else:
            q, v = q_aux, s_aux_chunks[iv]
        total += jnp.mean(jnp.sum(-q * jax.nn.log_softmax(v, axis=-1), axis=-1))
    total = total / 4.0

    new_center = jnp.stack([
        update_center(teacher_pair[0].astype(jnp.float32), center[0][None],
                      center_momentum, axis_name)[0],
        update_center(teacher_pair[1].astype(jnp.float32), center[1][None],
                      center_momentum, axis_name)[0],
    ])
    return total, new_center


def update_center(
    teacher_output: jnp.ndarray,
    center: jnp.ndarray,
    center_momentum: float = 0.9,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """EMA center update with cross-device mean (ref: train_ssl.py:673-691)."""
    batch_center = jnp.sum(teacher_output, axis=0, keepdims=True)
    n = jnp.asarray(teacher_output.shape[0], jnp.float32)
    if axis_name is not None:
        batch_center = jax.lax.psum(batch_center, axis_name)
        n = n * jax.lax.psum(1.0, axis_name)
    batch_center = batch_center / n
    return center * center_momentum + batch_center * (1.0 - center_momentum)


def ema_update(teacher_params, student_params, momentum):
    """Teacher EMA as a pytree lerp (ref: train_ssl.py:554-563)."""
    return jax.tree.map(
        lambda t, s: t * momentum + s.astype(t.dtype) * (1.0 - momentum),
        teacher_params,
        student_params,
    )
