"""Parity of DINO losses, schedules and optimizers vs the reference."""

import numpy as np
import pytest

import conftest

conftest.add_reference_path()

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dino_video_summarization_transformer_tpu.train import (  # noqa: E402
    cosine_scheduler,
    dino_loss,
    ema_update,
    lars,
    per_param_clip,
    scoring_dino_loss,
    teacher_temp_schedule,
)


def torch_scoring_loss(s, t, teacher_temp=0.02, student_temp=0.3):
    """Oracle: the scoring DINOLoss formula (ref: dino_similarity.py:129-135)."""
    center = torch.zeros(1, s.shape[-1])
    p_teacher = F.softmax((t - center) / teacher_temp, dim=-1)
    p_student = s / student_temp
    return torch.sum(-p_teacher * F.log_softmax(p_student, dim=-1), dim=-1).mean()


def test_scoring_loss_matches_reference_formula():
    rng = np.random.RandomState(0)
    for _ in range(3):
        s = rng.randn(768).astype(np.float32)
        t = rng.randn(768).astype(np.float32)
        expected = torch_scoring_loss(torch.from_numpy(s), torch.from_numpy(t)).item()
        got = float(scoring_dino_loss(jnp.asarray(s), jnp.asarray(t)))
        assert abs(got - expected) < 1e-5


def test_scoring_loss_batched_equals_per_frame():
    rng = np.random.RandomState(1)
    s = rng.randn(16, 768).astype(np.float32)
    t = rng.randn(16, 768).astype(np.float32)
    batched = np.asarray(scoring_dino_loss(jnp.asarray(s), jnp.asarray(t)))
    per = [float(scoring_dino_loss(jnp.asarray(s[i]), jnp.asarray(t[i]))) for i in range(16)]
    np.testing.assert_allclose(batched, per, rtol=1e-6)


def torch_train_dino_loss(student, teacher, center, temp, n_crops, student_temp=0.1,
                          center_momentum=0.9):
    """Oracle: training DINOLoss forward + center update, single process
    (ref: train_ssl.py:626-691 with world_size=1)."""
    student_out = (student / student_temp).chunk(n_crops)
    teacher_out = F.softmax((teacher - center) / temp, dim=-1).detach().chunk(2)
    total, n_terms = 0.0, 0
    for iq, q in enumerate(teacher_out):
        for v in range(n_crops):
            if v == iq:
                continue
            total = total + torch.sum(-q * F.log_softmax(student_out[v], dim=-1), dim=-1).mean()
            n_terms += 1
    total = total / n_terms
    batch_center = torch.sum(teacher, dim=0, keepdim=True) / teacher.shape[0]
    new_center = center * center_momentum + batch_center * (1 - center_momentum)
    return total, new_center


def test_train_dino_loss_matches_reference_formula():
    rng = np.random.RandomState(2)
    B, D, n_crops = 4, 32, 10
    student = rng.randn(n_crops * B, D).astype(np.float32)
    teacher = rng.randn(2 * B, D).astype(np.float32)
    center = rng.randn(1, D).astype(np.float32)
    temp = 0.04

    t_loss, t_center = torch_train_dino_loss(
        torch.from_numpy(student), torch.from_numpy(teacher),
        torch.from_numpy(center), temp, n_crops)
    j_loss, j_center = dino_loss(
        jnp.asarray(student), jnp.asarray(teacher), jnp.asarray(center),
        temp, n_crops)
    assert abs(float(j_loss) - t_loss.item()) < 1e-5
    np.testing.assert_allclose(np.asarray(j_center), t_center.numpy(), atol=1e-6)


def test_center_psum_matches_global_batch():
    """Sharded center update over 8 CPU devices == unsharded update."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    rng = np.random.RandomState(3)
    D = 16
    teacher = rng.randn(16, D).astype(np.float32)
    center = np.zeros((1, D), np.float32)

    from dino_video_summarization_transformer_tpu.train import update_center

    expected = np.asarray(update_center(jnp.asarray(teacher), jnp.asarray(center)))

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    def shard_fn(t, c):
        return update_center(t, c, axis_name="data")

    from jax.experimental.shard_map import shard_map

    f = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("data"), P()), out_specs=P(),
    )
    got = np.asarray(f(jnp.asarray(teacher), jnp.asarray(center)))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_teacher_temp_schedule():
    conftest.add_reference_path()
    sched = teacher_temp_schedule(0.04, 0.07, 10, 30)
    assert len(sched) == 30
    assert sched[0] == pytest.approx(0.04)
    assert sched[9] == pytest.approx(0.07)
    assert sched[-1] == pytest.approx(0.07)


def test_cosine_scheduler_matches_reference():
    from utils import utils as rutils  # reference oracle

    ours = cosine_scheduler(0.5, 1e-6, epochs=10, niter_per_ep=25, warmup_epochs=3,
                            start_warmup_value=1e-8)
    ref = rutils.cosine_scheduler(0.5, 1e-6, 10, 25, warmup_epochs=3,
                                  start_warmup_value=1e-8)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_per_param_clip_matches_reference():
    from utils import utils as rutils
    import torch.nn as nn

    torch.manual_seed(0)
    model = nn.Sequential(nn.Linear(8, 16), nn.Linear(16, 4))
    x = torch.randn(4, 8)
    model(x).sum().backward()
    grads_before = {n: p.grad.clone() for n, p in model.named_parameters()}
    rutils.clip_gradients(model, clip=0.1)
    grads_after = {n: p.grad for n, p in model.named_parameters()}

    jgrads = {n: jnp.asarray(g.numpy()) for n, g in grads_before.items()}
    clipped, _ = per_param_clip(0.1).update(jgrads, None)
    for n in jgrads:
        np.testing.assert_allclose(
            np.asarray(clipped[n]), grads_after[n].numpy(), atol=1e-6,
            err_msg=n)


def test_lars_matches_reference_trajectory():
    from utils import utils as rutils

    torch.manual_seed(1)
    w = torch.randn(6, 4, requires_grad=True)
    b = torch.randn(6, requires_grad=True)
    opt = rutils.LARS([{"params": [w, b]}], lr=0.1, weight_decay=0.01,
                      momentum=0.9, eta=0.001)

    # .copy(): on CPU jnp.asarray can zero-copy torch-shared memory, which
    # opt.step() then mutates in place
    jw = jnp.asarray(w.detach().numpy().copy())
    jb = jnp.asarray(b.detach().numpy().copy())
    core = lars(momentum=0.9)
    state = core.init({"w": jw, "b": jb})

    for step in range(4):
        # deterministic pseudo-gradients
        gw = torch.full_like(w, 0.1 * (step + 1))
        gb = torch.full_like(b, -0.05 * (step + 1))
        w.grad, b.grad = gw.clone(), gb.clone()
        opt.step()

        grads = {"w": jnp.asarray(gw.numpy()), "b": jnp.asarray(gb.numpy())}
        params = {"w": jw, "b": jb}
        # reference: wd only on ndim != 1, added before adaptation
        grads = jax.tree.map(
            lambda g, p: g + 0.01 * p if p.ndim != 1 else g, grads, params)
        updates, state = core.update(grads, state, params)
        jw = jw - 0.1 * updates["w"]
        jb = jb - 0.1 * updates["b"]

    np.testing.assert_allclose(np.asarray(jw), w.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(jb), b.detach().numpy(), atol=1e-6)


def test_ema_update():
    t = {"a": jnp.ones((3,)), "b": jnp.zeros((2, 2))}
    s = {"a": jnp.zeros((3,)), "b": jnp.ones((2, 2))}
    out = ema_update(t, s, 0.9)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.9)
    np.testing.assert_allclose(np.asarray(out["b"]), 0.1)


def test_freeze_last_layer_blocks_all_updates():
    """Frozen last_layer must not move even under weight decay
    (regression: wd was applied after gradient cancellation)."""
    from dino_video_summarization_transformer_tpu.train.optim import (
        apply_updates_with_schedules, build_optimizer)

    params = {"head": {"last_layer": {"weight_v": jnp.ones((4, 4))},
                       "fc": {"kernel": jnp.ones((4, 4))}}}
    grads = jax.tree.map(jnp.ones_like, params)
    core, mask = build_optimizer("sgd", params)
    state = core.init(params)
    new, _ = apply_updates_with_schedules(
        params, grads, state, core, mask, lr=jnp.asarray(0.1),
        wd=jnp.asarray(0.5), clip=None, freeze_last_layer=jnp.asarray(True))
    np.testing.assert_array_equal(
        np.asarray(new["head"]["last_layer"]["weight_v"]), 1.0)
    assert not np.array_equal(np.asarray(new["head"]["fc"]["kernel"]),
                              np.ones((4, 4)))
