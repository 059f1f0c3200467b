"""DINO self-supervised training: state, sharded train step, loop pieces.

TPU re-design of the reference trainer (ref: train_ssl.py:154-599):

* student/teacher/optimizer/center live in one ``TrainState`` pytree,
  replicated over the mesh; crop batches are sharded along the data axis.
* One jitted ``train_step`` fuses: both student forwards (global 224 and
  local 96 crops — the static-shape equivalent of MultiCropWrapper's
  same-resolution grouping, ref: utils/utils.py:582-609), the teacher
  forward, DINO loss with centering (global-batch statistics emerge from
  jnp.sum over the sharded batch dim — XLA inserts the psum the reference
  does by hand, ref: train_ssl.py:681-687), gradient clip + last-layer
  freeze, the optimizer update and the teacher EMA.
* Schedules (cosine lr/wd/teacher-momentum, ref: train_ssl.py:395-408) are
  host-side numpy arrays indexed per step and passed in as scalars.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import timesformer as tsf
from ..models.heads import dino_head_forward, init_dino_head
from .dino import dino_loss, ema_update
from .optim import apply_updates_with_schedules, build_optimizer


class TrainState(NamedTuple):
    student: Any
    teacher: Any
    center: jnp.ndarray
    opt_state: Any
    step: jnp.ndarray


def init_train_state(
    rng: jax.Array,
    model_cfg: tsf.TimeSformerConfig,
    out_dim: int = 65536,
    optimizer: str = "adamw",
    momentum: float = 0.9,
    pretrained_backbone=None,
    two_token: bool = False,
) -> tuple[TrainState, Any, Any]:
    """Build student/teacher (+head) and optimizer. Teacher starts as a copy
    of the student (ref: train_ssl.py:330-333). two_token switches to the
    aux-token backbone + dual DINO head + (2, out_dim) center
    (ref: train_ssl.py:610-620)."""
    from ..models.heads import init_multi_dino_head

    k1, k2 = jax.random.split(rng)
    if two_token:
        backbone = (pretrained_backbone if pretrained_backbone is not None
                    else tsf.init_aux_token_timesformer(k1, model_cfg))
        head = init_multi_dino_head(k2, model_cfg.embed_dim, out_dim)
        center = jnp.zeros((2, out_dim))
    else:
        backbone = (pretrained_backbone if pretrained_backbone is not None
                    else tsf.init_timesformer(k1, model_cfg))
        head = init_dino_head(k2, model_cfg.embed_dim, out_dim)
        center = jnp.zeros((1, out_dim))
    student = {"backbone": backbone, "head": head}
    teacher = jax.tree.map(jnp.copy, student)
    core, mask = build_optimizer(optimizer, student, momentum=momentum)
    state = TrainState(
        student=student,
        teacher=teacher,
        center=center,
        opt_state=core.init(student),
        step=jnp.zeros((), jnp.int32),
    )
    return state, core, mask


def make_train_step(
    model_cfg: tsf.TimeSformerConfig,
    core,
    mask,
    n_local_crops: int = 8,
    clip_grad: Optional[float] = 3.0,
    student_temp: float = 0.1,
    center_momentum: float = 0.9,
    compute_dtype=jnp.float32,
    mesh=None,
    donate: bool = True,
    remat: bool = False,
    two_token: bool = False,
):
    """Returns jitted step(state, global_crops, local_crops, lr, wd,
    teacher_momentum, teacher_temp, freeze_flag) -> (state, metrics).

    global_crops: (2*B, C, T, S, S); local_crops: (n_local*B, C, T, s, s).
    n_crops = 2 + n_local (ref: train_ssl.py:356-365). ``remat``
    rematerializes the student forwards (activation memory ~O(depth) ->
    O(1) at ~30% extra FLOPs); ``two_token`` runs the aux-token model with
    the dual head and two-stream loss (ref: train_ssl.py:610-651).
    """
    n_crops = 2 + n_local_crops

    def fwd_student(params, x):
        return tsf.forward(params, x, model_cfg, compute_dtype=compute_dtype)

    if remat:
        fwd_student = jax.checkpoint(fwd_student)

    def loss_fn(student, teacher, center, g_crops, l_crops, teacher_temp):
        if two_token:
            from ..models.heads import multi_dino_head_forward
            from .dino import dino_loss_two_token

            # two_token uses 4 student views: 2 global + 2 local
            # (ref: train_ssl.py:609 n_crops=4, decoder.py:401-414)
            s_g = tsf.aux_token_forward_features(
                student["backbone"], g_crops, model_cfg, training=True,
                compute_dtype=compute_dtype)
            s_l = tsf.aux_token_forward_features(
                student["backbone"], l_crops, model_cfg, training=True,
                compute_dtype=compute_dtype)
            s_pair = (jnp.concatenate([s_g[0], s_l[0]], axis=0),
                      jnp.concatenate([s_g[1], s_l[1]], axis=0))
            s_out = multi_dino_head_forward(student["head"], s_pair)
            t_g = tsf.aux_token_forward_features(
                teacher["backbone"], g_crops, model_cfg, training=True,
                compute_dtype=compute_dtype)
            t_out = multi_dino_head_forward(teacher["head"], t_g)
            t_out = jax.lax.stop_gradient(t_out)
            return dino_loss_two_token(
                s_out, t_out, center, teacher_temp,
                student_temp=student_temp, center_momentum=center_momentum)
        s_g = fwd_student(student["backbone"], g_crops)
        s_l = fwd_student(student["backbone"], l_crops)
        s_out = dino_head_forward(
            student["head"], jnp.concatenate([s_g, s_l], axis=0))
        t_g = tsf.forward(teacher["backbone"], g_crops, model_cfg,
                          compute_dtype=compute_dtype)
        t_out = dino_head_forward(teacher["head"], t_g)
        t_out = jax.lax.stop_gradient(t_out)
        return dino_loss(
            s_out.astype(jnp.float32), t_out.astype(jnp.float32), center,
            teacher_temp, n_crops=n_crops, student_temp=student_temp,
            center_momentum=center_momentum)

    def step_fn(state: TrainState, g_crops, l_crops, lr, wd,
                teacher_momentum, teacher_temp, freeze_last):
        (loss, new_center), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
            state.student, state.teacher, state.center, g_crops, l_crops,
            teacher_temp)
        student, opt_state = apply_updates_with_schedules(
            state.student, grads, state.opt_state, core, mask, lr, wd,
            clip=clip_grad, freeze_last_layer=freeze_last)
        teacher = ema_update(state.teacher, student, teacher_momentum)
        new_state = TrainState(student, teacher, new_center, opt_state,
                               state.step + 1)
        return new_state, {"loss": loss}

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, data, None, None, None, None, None),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def build_schedules(args_like, niter_per_ep: int):
    """The three cosine schedules (ref: train_ssl.py:395-408).

    args_like needs: lr, min_lr, warmup_epochs, epochs, batch_size_per_gpu,
    weight_decay, weight_decay_end, momentum_teacher; lr is linearly scaled
    by global batch / 256 like the reference.
    """
    from .schedules import cosine_scheduler

    world = jax.device_count()
    lr_schedule = cosine_scheduler(
        args_like.lr * (args_like.batch_size_per_gpu * world) / 256.0,
        args_like.min_lr, args_like.epochs, niter_per_ep,
        warmup_epochs=args_like.warmup_epochs)
    wd_schedule = cosine_scheduler(
        args_like.weight_decay, args_like.weight_decay_end,
        args_like.epochs, niter_per_ep)
    momentum_schedule = cosine_scheduler(
        args_like.momentum_teacher, 1.0, args_like.epochs, niter_per_ep)
    return lr_schedule, wd_schedule, momentum_schedule
