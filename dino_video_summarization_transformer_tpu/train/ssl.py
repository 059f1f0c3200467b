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
    cnn_distill_dim: int = 0,
) -> tuple[TrainState, Any, Any]:
    """Build student/teacher (+head) and optimizer. Teacher starts as a copy
    of the student (ref: train_ssl.py:330-333). two_token switches to the
    aux-token backbone + dual DINO head + (2, out_dim) center
    (ref: train_ssl.py:610-620). cnn_distill_dim > 0 adds a linear
    projection (embed_dim -> cnn feature dim) used by the optional S3D
    feature-distillation term (extension: the reference constructs the S3D
    teacher under MODEL.CNN_DISTILL but ships no loss term — see
    make_train_step)."""
    from ..models.heads import init_multi_dino_head

    k1, k2, k3 = jax.random.split(rng, 3)
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
    if cnn_distill_dim:
        student["cnn_proj"] = tsf._linear_init(
            k3, model_cfg.embed_dim, cnn_distill_dim)
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
    cnn_params=None,
    cnn_distill_weight: float = 0.0,
    state_sharding=None,
    backbone_forward=None,
):
    """Returns jitted step(state, global_crops, local_crops, lr, wd,
    teacher_momentum, teacher_temp, freeze_flag) -> (state, metrics).

    global_crops: (2*B, C, T, S, S); local_crops: (n_local*B, C, T, s, s).
    n_crops = 2 + n_local (ref: train_ssl.py:356-365). ``remat``
    rematerializes the student forwards (activation memory ~O(depth) ->
    O(1) at ~30% extra FLOPs).

    ``two_token`` runs the aux-token model with the dual head and the
    6-view protocol (ref: train_ssl.py:516-525, decoder.py:401-414): the
    teacher sees the 2 global 224 views (g_crops), the student the 4
    OTHER views, passed as local_crops = (s96, s224) with s96 the two
    96px spatial crops and s224 the two plain-224 temporally-local views.

    ``cnn_params``/``cnn_distill_weight``: optional S3D feature
    distillation on the global crops. NOTE the reference CONSTRUCTS the
    S3D teacher under MODEL.CNN_DISTILL (ref: train_ssl.py:263-277) but
    its train loop never adds a loss term for it (grep-verified); weight
    0.0 reproduces that behavior exactly, weight > 0 enables a
    negative-cosine feature regression via the student's cnn_proj head
    (an extension, flagged as such).

    ``backbone_forward``: optional (params, x) -> CLS features override
    for BOTH student and teacher backbone passes of the plain variant —
    the hook that runs the pipeline-/sequence-parallel forwards
    (parallel/pp.py pp_forward_features, parallel/sp.py
    sp_forward_features) inside the train step. Must be differentiable
    and value-equal to tsf.forward (both are equivalence-pinned). The
    default is the single-chip tsf.forward.
    """
    n_crops = 2 + n_local_crops

    def fwd_backbone(params, x):
        if backbone_forward is not None:
            return backbone_forward(params, x)
        return tsf.forward(params, x, model_cfg, compute_dtype=compute_dtype)

    fwd_student = jax.checkpoint(fwd_backbone) if remat else fwd_backbone

    use_cnn = cnn_params is not None and cnn_distill_weight > 0.0

    def cnn_distill_term(student, g_crops, s_g):
        """Negative cosine between projected student CLS features and
        pooled (frozen) S3D features on the global crops."""
        from ..models import s3d

        feats = s3d.forward(cnn_params, g_crops, training=False,
                            compute_dtype=compute_dtype)  # (B, 1024, t, h, w)
        feats = feats.mean(axis=(2, 3, 4)).astype(jnp.float32)
        feats = jax.lax.stop_gradient(
            feats / jnp.clip(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12))
        proj = (s_g.astype(jnp.float32) @ student["cnn_proj"]["kernel"]
                + student["cnn_proj"]["bias"])
        proj = proj / jnp.clip(jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-12)
        return jnp.mean(1.0 - jnp.sum(proj * feats, axis=-1))

    def loss_fn(student, teacher, center, g_crops, l_crops, teacher_temp):
        if two_token:
            from ..models.heads import multi_dino_head_forward
            from .dino import dino_loss_two_token

            s96, s224 = l_crops
            s_a = tsf.aux_token_forward_features(
                student["backbone"], s96, model_cfg, training=True,
                compute_dtype=compute_dtype)
            s_b = tsf.aux_token_forward_features(
                student["backbone"], s224, model_cfg, training=True,
                compute_dtype=compute_dtype)
            # view order [2x 96px crops, 2x temporal-local 224] matches the
            # reference's student(images[2:]) chunking (ref: train_ssl.py:521)
            s_pair = (jnp.concatenate([s_a[0], s_b[0]], axis=0),
                      jnp.concatenate([s_a[1], s_b[1]], axis=0))
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
        t_g = fwd_backbone(teacher["backbone"], g_crops)
        t_out = dino_head_forward(teacher["head"], t_g)
        t_out = jax.lax.stop_gradient(t_out)
        loss, new_center = dino_loss(
            s_out.astype(jnp.float32), t_out.astype(jnp.float32), center,
            teacher_temp, n_crops=n_crops, student_temp=student_temp,
            center_momentum=center_momentum)
        if use_cnn:
            loss = loss + cnn_distill_weight * cnn_distill_term(
                student, g_crops, s_g)
        return loss, new_center

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
    # tensor parallelism: state_sharding (parallel/tp.py tp_sharding_tree
    # over a concrete TrainState) shards qkv/mlp/head params over the
    # mesh's model axis; XLA places the TP collectives. Default: the
    # reference's DP-only protocol (params replicated).
    state_shard = state_sharding if state_sharding is not None else repl
    return jax.jit(
        step_fn,
        in_shardings=(state_shard, data, data, None, None, None, None, None),
        out_shardings=(state_shard, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_rand_fr_train_step(
    model_cfg: tsf.TimeSformerConfig,
    core,
    mask,
    clip_grad: Optional[float] = 3.0,
    student_temp: float = 0.1,
    center_momentum: float = 0.9,
    compute_dtype=jnp.float32,
    mesh=None,
    donate: bool = True,
):
    """Variable-frame-count multi-crop DINO step (DATA.RAND_FR).

    The reference's MultiCropWrapper groups the 10 crops by the hardcoded
    vary_fr boundaries [1, 2, 4, 6, 8, 10] (ref: utils/utils.py:583-588),
    i.e. one forward per frame-count group: global 4f, global 8f, then
    local pairs of 2/4/8/16 frames (ref: decoder.py:418-427). On TPU each
    group is a separate static-shape forward sharing params — exactly the
    same math, compiled once per shape.

    step(state, crops, lr, wd, m, tt, freeze) where crops is a 6-tuple:
      (g4 (B,C,4,S,S), g8 (B,C,8,S,S), l2 (2B,C,2,s,s), l4, l8, l16)
    """

    def fwd(params, x):
        return tsf.forward(params, x, model_cfg, compute_dtype=compute_dtype)

    def loss_fn(student, teacher, center, crops, teacher_temp):
        s_out = dino_head_forward(
            student["head"],
            jnp.concatenate([fwd(student["backbone"], c) for c in crops], 0))
        # teacher: the two global groups (ref: utils.py:586-588 idx [1,2])
        t_feats = jnp.concatenate(
            [fwd(teacher["backbone"], crops[0]),
             fwd(teacher["backbone"], crops[1])], 0)
        t_out = jax.lax.stop_gradient(
            dino_head_forward(teacher["head"], t_feats))
        return dino_loss(
            s_out.astype(jnp.float32), t_out.astype(jnp.float32), center,
            teacher_temp, n_crops=10, student_temp=student_temp,
            center_momentum=center_momentum)

    def step_fn(state: TrainState, crops, lr, wd, teacher_momentum,
                teacher_temp, freeze_last):
        (loss, new_center), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
            state.student, state.teacher, state.center, crops, teacher_temp)
        student, opt_state = apply_updates_with_schedules(
            state.student, grads, state.opt_state, core, mask, lr, wd,
            clip=clip_grad, freeze_last_layer=freeze_last)
        teacher = ema_update(state.teacher, student, teacher_momentum)
        return TrainState(student, teacher, new_center, opt_state,
                          state.step + 1), {"loss": loss}

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, None, None, None, None, None),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


class TwoStreamState(NamedTuple):
    """MODEL.TWO_STREAM training state (ref: train_ssl.py:280-346):
    RGB TimeSformer student/teacher with a dual (MultiDINO) head, plus a
    2D ViT motion student/teacher over optical-flow frames, and the three
    DINO-loss centers (rgb, flow, cross)."""
    student: Any
    teacher: Any
    motion_student: Any
    motion_teacher: Any
    center_rgb: jnp.ndarray
    center_flow: jnp.ndarray
    center_cross: jnp.ndarray
    opt_state: Any
    step: jnp.ndarray


def init_two_stream_state(
    rng: jax.Array,
    model_cfg: tsf.TimeSformerConfig,
    motion_cfg,
    out_dim: int = 65536,
    optimizer: str = "adamw",
    momentum: float = 0.9,
    pretrained_backbone=None,
    pretrained_motion=None,
) -> tuple[TwoStreamState, Any, Any]:
    """(ref: train_ssl.py:222-231, 280-346). The reference's shipped
    TWO_STREAM head wiring is defective — MultiDINOHead.forward receives
    the plain backbone's TENSOR and row-slices it (`x[0], x[1]`,
    vision_transformer.py:337) — so per SURVEY section 7 the INTENDED
    semantics are built: both head streams read the same CLS features
    (rgb head + cross-modal flow-prediction head)."""
    from ..models import vit2d
    from ..models.heads import init_dino_head as _idh, init_multi_dino_head

    k1, k2, k3, k4 = jax.random.split(rng, 4)
    backbone = (pretrained_backbone if pretrained_backbone is not None
                else tsf.init_timesformer(k1, model_cfg))
    student = {"backbone": backbone,
               "head": init_multi_dino_head(k2, model_cfg.embed_dim, out_dim)}
    motion_backbone = (pretrained_motion if pretrained_motion is not None
                       else vit2d.init_vit2d(k3, motion_cfg))
    motion_student = {"backbone": motion_backbone,
                      "head": _idh(k4, motion_cfg.embed_dim, out_dim)}
    teacher = jax.tree.map(jnp.copy, student)
    motion_teacher = jax.tree.map(jnp.copy, motion_student)
    # one optimizer over both students (ref: train_ssl.py:377-381 merges
    # the motion params into the same param groups)
    combined = {"rgb": student, "motion": motion_student}
    core, mask = build_optimizer(optimizer, combined, momentum=momentum)
    state = TwoStreamState(
        student=student,
        teacher=teacher,
        motion_student=motion_student,
        motion_teacher=motion_teacher,
        center_rgb=jnp.zeros((1, out_dim)),
        center_flow=jnp.zeros((1, out_dim)),
        center_cross=jnp.zeros((1, out_dim)),
        opt_state=core.init(combined),
        step=jnp.zeros((), jnp.int32),
    )
    return state, core, mask


def make_two_stream_train_step(
    model_cfg: tsf.TimeSformerConfig,
    motion_cfg,
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
):
    """TWO_STREAM motion-distillation step (ref: train_ssl.py:507-519):

      loss = dino(rgb_student(2+n crops), rgb_teacher(2 globals))
           + dino(motion_student(2 flow views), motion_teacher(2 flow views))
           + dino(cross_student(2+n crops), motion_teacher(2 flow views))

    step(state, g_crops (2B,C,T,S,S), l_crops (nB,C,T,s,s),
         flow (2B,C,H,W), lr, wd, m, tt, freeze).
    """
    from ..models import vit2d
    from ..models.heads import multi_dino_head_forward

    n_crops = 2 + n_local_crops

    def fwd(params, x):
        return tsf.forward(params, x, model_cfg, compute_dtype=compute_dtype)

    if remat:
        fwd = jax.checkpoint(fwd)

    def mfwd(params, x):
        return vit2d.forward(params, x, motion_cfg,
                             compute_dtype=compute_dtype)

    def loss_fn(student, motion_student, teacher, motion_teacher,
                centers, g_crops, l_crops, flow, teacher_temp):
        center_rgb, center_flow, center_cross = centers
        feats = jnp.concatenate([fwd(student["backbone"], g_crops),
                                 fwd(student["backbone"], l_crops)], 0)
        s_rgb, s_cross = multi_dino_head_forward(
            student["head"], (feats, feats))
        t_feats = fwd(teacher["backbone"], g_crops)
        t_rgb, _ = multi_dino_head_forward(
            teacher["head"], (t_feats, t_feats))
        t_rgb = jax.lax.stop_gradient(t_rgb)

        s_flow = dino_head_forward(motion_student["head"],
                                   mfwd(motion_student["backbone"], flow))
        t_flow = jax.lax.stop_gradient(
            dino_head_forward(motion_teacher["head"],
                              mfwd(motion_teacher["backbone"], flow)))

        l_rgb, c_rgb = dino_loss(
            s_rgb.astype(jnp.float32), t_rgb.astype(jnp.float32),
            center_rgb, teacher_temp, n_crops=n_crops,
            student_temp=student_temp, center_momentum=center_momentum)
        l_flow, c_flow = dino_loss(
            s_flow.astype(jnp.float32), t_flow.astype(jnp.float32),
            center_flow, teacher_temp, n_crops=2,
            student_temp=student_temp, center_momentum=center_momentum)
        l_cross, c_cross = dino_loss(
            s_cross.astype(jnp.float32), t_flow.astype(jnp.float32),
            center_cross, teacher_temp, n_crops=n_crops,
            student_temp=student_temp, center_momentum=center_momentum)
        loss = l_rgb + l_flow + l_cross
        return loss, ((c_rgb, c_flow, c_cross),
                      {"loss": loss, "loss_rgb": l_rgb,
                       "loss_flow": l_flow, "loss_cross": l_cross})

    def step_fn(state: TwoStreamState, g_crops, l_crops, flow, lr, wd,
                teacher_momentum, teacher_temp, freeze_last):
        def combined_loss(combined, *rest):
            return loss_fn(combined["rgb"], combined["motion"], *rest)

        combined = {"rgb": state.student, "motion": state.motion_student}
        centers = (state.center_rgb, state.center_flow, state.center_cross)
        (loss, (new_centers, metrics)), grads = jax.value_and_grad(
            combined_loss, has_aux=True)(
            combined, state.teacher, state.motion_teacher, centers,
            g_crops, l_crops, flow, teacher_temp)
        combined, opt_state = apply_updates_with_schedules(
            combined, grads, state.opt_state, core, mask, lr, wd,
            clip=clip_grad, freeze_last_layer=freeze_last)
        teacher = ema_update(state.teacher, combined["rgb"], teacher_momentum)
        motion_teacher = ema_update(
            state.motion_teacher, combined["motion"], teacher_momentum)
        new_state = TwoStreamState(
            combined["rgb"], teacher, combined["motion"], motion_teacher,
            new_centers[0], new_centers[1], new_centers[2],
            opt_state, state.step + 1)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, data, data, None, None, None, None, None),
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
