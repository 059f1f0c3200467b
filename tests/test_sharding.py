"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from dino_video_summarization_transformer_tpu.models import vit_tiny_config
from dino_video_summarization_transformer_tpu.parallel import (
    build_mesh, data_sharding, replicated)
from dino_video_summarization_transformer_tpu.train.ssl import (
    build_schedules, init_train_state, make_train_step)


@pytest.fixture(scope="module")
def tiny_setup():
    # depth 4 (divisible by the pipe-4 / tp-2 splits below): sharding
    # equivalence doesn't depend on block count; compile time does
    import dataclasses
    cfg = dataclasses.replace(
        vit_tiny_config(num_frames=2, num_classes=0, img_size=48), depth=4)
    state, core, mask = init_train_state(
        jax.random.key(0), cfg, out_dim=128, optimizer="adamw")
    rng = np.random.RandomState(0)
    B = 8
    g = rng.randn(2 * B, 3, 2, 48, 48).astype(np.float32)
    l = rng.randn(2 * B, 3, 2, 32, 32).astype(np.float32)
    return cfg, state, core, mask, g, l


def test_sharded_step_matches_single_device(tiny_setup):
    """DP-sharded train step must produce the same loss/params as the
    unsharded step — the centering stats and gradient reductions must be
    global (the reference's DDP all-reduce + center all_reduce semantics,
    ref: train_ssl.py:538, 681-687)."""
    cfg, state, core, mask, g, l = tiny_setup

    step_single = make_train_step(cfg, core, mask, n_local_crops=2, donate=False)
    s1, m1 = step_single(state, jnp.asarray(g), jnp.asarray(l),
                         1e-3, 1e-4, 0.99, 0.04, False)

    mesh = build_mesh(data=8, model=1)
    state_r = jax.device_put(state, replicated(mesh))
    step_sharded = make_train_step(cfg, core, mask, n_local_crops=2,
                                   mesh=mesh, donate=False)
    s2, m2 = step_sharded(
        state_r,
        jax.device_put(jnp.asarray(g), data_sharding(mesh)),
        jax.device_put(jnp.asarray(l), data_sharding(mesh)),
        1e-3, 1e-4, 0.99, 0.04, False)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), abs=1e-5)
    np.testing.assert_allclose(
        np.asarray(s1.center), np.asarray(s2.center), atol=1e-6)
    # student params updated identically
    flat1 = jax.tree.leaves(s1.student)
    flat2 = jax.tree.leaves(s2.student)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_tensor_parallel_step_matches_single_device(tiny_setup):
    """dp x tp 2x2 mesh: Megatron-style param sharding over the model axis
    (parallel/tp.py) must leave the train step's math unchanged — GSPMD
    inserts the TP collectives; the update equals the unsharded step."""
    from dino_video_summarization_transformer_tpu.parallel import (
        shard_state, tp_sharding_tree, tp_spec_tree)

    cfg, state, core, mask, g, l = tiny_setup

    step_single = make_train_step(cfg, core, mask, n_local_crops=2,
                                  donate=False)
    s1, m1 = step_single(state, jnp.asarray(g), jnp.asarray(l),
                         1e-3, 1e-4, 0.99, 0.04, False)

    from jax.sharding import PartitionSpec as P

    mesh = build_mesh(data=2, model=2, devices=jax.devices()[:4])
    # the spec tree must actually shard the big tensors
    specs = tp_spec_tree(state, mesh)
    spec_leaves = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    n_sharded = sum(1 for s in spec_leaves
                    if isinstance(s, P) and any(a == "model" for a in s))
    assert n_sharded >= 10, n_sharded  # qkv/fc1/proj/fc2/head x {s,t,mu,nu}

    state_tp = shard_state(state, mesh)
    step_tp = make_train_step(cfg, core, mask, n_local_crops=2, mesh=mesh,
                              donate=False,
                              state_sharding=tp_sharding_tree(state, mesh))
    s2, m2 = step_tp(
        state_tp,
        jax.device_put(jnp.asarray(g), data_sharding(mesh)),
        jax.device_put(jnp.asarray(l), data_sharding(mesh)),
        1e-3, 1e-4, 0.99, 0.04, False)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    # the updated state keeps its TP sharding (no silent replication)
    qkv = s2.student["backbone"]["blocks"]["attn"]["qkv"]["kernel"]
    assert not qkv.sharding.is_fully_replicated
    for a, b in zip(jax.tree.leaves(s1.student), jax.tree.leaves(s2.student)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_teacher_tracks_student(tiny_setup):
    cfg, state, core, mask, g, l = tiny_setup
    step = make_train_step(cfg, core, mask, n_local_crops=2, donate=False)
    s, _ = step(state, jnp.asarray(g), jnp.asarray(l),
                1e-3, 0.0, 0.5, 0.04, False)
    # teacher = 0.5*old_teacher + 0.5*new_student
    t_leaf = jax.tree.leaves(s.teacher)[0]
    st_leaf = jax.tree.leaves(s.student)[0]
    old_leaf = jax.tree.leaves(state.student)[0]
    np.testing.assert_allclose(
        np.asarray(t_leaf),
        0.5 * np.asarray(old_leaf) + 0.5 * np.asarray(st_leaf), atol=1e-6)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_shapes():
    import __graft_entry__ as ge

    fn, (params, x) = ge.entry()
    assert x.shape == (2, 3, 8, 224, 224)
    # trace only (full ViT-B fwd on CPU is slow): shape-level validation
    out = jax.eval_shape(fn, params, x)
    assert out.shape == (2, 400)


def test_build_schedules():
    class A:
        lr = 5e-4
        min_lr = 1e-6
        warmup_epochs = 2
        epochs = 10
        batch_size_per_gpu = 4
        weight_decay = 0.04
        weight_decay_end = 0.4
        momentum_teacher = 0.996

    lr, wd, mom = build_schedules(A(), niter_per_ep=7)
    assert len(lr) == len(wd) == len(mom) == 70
    assert mom[-1] == pytest.approx(1.0, abs=2e-3)
    assert lr[0] == 0.0  # warmup from 0


def test_remat_matches_no_remat(tiny_setup):
    """jax.checkpoint rematerialization must not change the update."""
    cfg, state, core, mask, g, l = tiny_setup
    s_a, m_a = make_train_step(cfg, core, mask, n_local_crops=2, donate=False)(
        state, jnp.asarray(g), jnp.asarray(l), 1e-3, 1e-4, 0.99, 0.04, False)
    s_b, m_b = make_train_step(cfg, core, mask, n_local_crops=2, donate=False,
                               remat=True)(
        state, jnp.asarray(g), jnp.asarray(l), 1e-3, 1e-4, 0.99, 0.04, False)
    assert float(m_a["loss"]) == pytest.approx(float(m_b["loss"]), abs=1e-6)
    for a, b in zip(jax.tree.leaves(s_a.student), jax.tree.leaves(s_b.student)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_two_token_train_step():
    """Two-token training path: aux-token backbone + dual head +
    two-stream loss with (2, out_dim) center."""
    # crop sizes where the reference's integer-truncated pos-embed resize
    # geometry is self-consistent for two tokens (64: 16+2 tokens, W=4;
    # 48: 9+2 tokens, W=3)
    cfg = vit_tiny_config(num_frames=2, num_classes=0, img_size=64)
    state, core, mask = init_train_state(
        jax.random.key(0), cfg, out_dim=64, optimizer="adamw", two_token=True)
    assert state.center.shape == (2, 64)
    step = make_train_step(cfg, core, mask, n_local_crops=2, donate=False,
                           two_token=True)
    rng = np.random.RandomState(0)
    B = 2
    # 6-view protocol (ref: train_ssl.py:516-525): teacher gets the 2
    # global views; the student the 2 spatial 96-crops + 2 temporal locals
    g = jnp.asarray(rng.randn(2 * B, 3, 2, 64, 64), jnp.float32)
    s96 = jnp.asarray(rng.randn(2 * B, 3, 2, 48, 48), jnp.float32)
    s224 = jnp.asarray(rng.randn(2 * B, 3, 2, 64, 64), jnp.float32)
    state2, metrics = step(state, g, (s96, s224), 1e-3, 1e-4, 0.99, 0.04, False)
    assert np.isfinite(float(metrics["loss"]))
    assert float(jnp.abs(state2.center).max()) > 0


def test_zero1_sharded_step_matches_single_device(tiny_setup):
    """ZeRO-1 optimizer-state sharding (parallel/zero.py): moments sharded
    over the data axis, params replicated — step values unchanged."""
    from dino_video_summarization_transformer_tpu.parallel import (
        zero_sharding_tree)

    cfg, state, core, mask, g, l = tiny_setup

    step_single = make_train_step(cfg, core, mask, n_local_crops=2,
                                  donate=False)
    s1, m1 = step_single(state, jnp.asarray(g), jnp.asarray(l),
                         1e-3, 1e-4, 0.99, 0.04, False)

    mesh = build_mesh(data=8, model=1)
    zshard = zero_sharding_tree(state, mesh)
    state_z = jax.device_put(state, zshard)
    # at least one moment leaf must actually be sharded for the test to
    # mean anything
    n_sharded = sum(
        1 for s in jax.tree.leaves(
            zero_sharding_tree(state, mesh).opt_state,
            is_leaf=lambda x: hasattr(x, "spec"))
        if any(p is not None for p in s.spec))
    assert n_sharded > 0
    step_z = make_train_step(cfg, core, mask, n_local_crops=2, mesh=mesh,
                             donate=False, state_sharding=zshard)
    s2, m2 = step_z(
        state_z,
        jax.device_put(jnp.asarray(g), data_sharding(mesh)),
        jax.device_put(jnp.asarray(l), data_sharding(mesh)),
        1e-3, 1e-4, 0.99, 0.04, False)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), abs=1e-5)
    for a, b in zip(jax.tree.leaves(s1.student), jax.tree.leaves(s2.student)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    for a, b in zip(jax.tree.leaves(s1.opt_state),
                    jax.tree.leaves(s2.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_pipeline_step_matches_single_device(tiny_setup):
    """dp2 x pipe4 mesh: the train step with both backbone forwards
    pipelined (pp_forward_features via make_train_step's backbone_forward
    hook) must equal the unsharded step — the GPipe schedule is plain
    differentiable JAX, so values AND the optimizer update match."""
    from functools import partial

    from dino_video_summarization_transformer_tpu.parallel.pp import (
        build_pipe_mesh, pp_forward_features)

    cfg, state, core, mask, g, l = tiny_setup

    step_single = make_train_step(cfg, core, mask, n_local_crops=2,
                                  donate=False)
    s1, m1 = step_single(state, jnp.asarray(g), jnp.asarray(l),
                         1e-3, 1e-4, 0.99, 0.04, False)

    mesh = build_pipe_mesh(4, data=2)
    state_r = jax.device_put(state, replicated(mesh))
    fwd = partial(pp_forward_features, cfg=cfg, mesh=mesh, n_micro=2)
    step_pp = make_train_step(cfg, core, mask, n_local_crops=2, mesh=mesh,
                              donate=False, backbone_forward=fwd)
    s2, m2 = step_pp(
        state_r,
        jax.device_put(jnp.asarray(g), data_sharding(mesh)),
        jax.device_put(jnp.asarray(l), data_sharding(mesh)),
        1e-3, 1e-4, 0.99, 0.04, False)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), abs=1e-5)
    for a, b in zip(jax.tree.leaves(s1.student),
                    jax.tree.leaves(s2.student)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_seq_parallel_step_matches_single_device():
    """dp4 x seq2 mesh: the train step with sequence-parallel backbone
    forwards (sp_forward_features) equals the unsharded step. Needs
    N % S == 0, so this test runs its own 64px geometry (N=16)."""
    from functools import partial

    from dino_video_summarization_transformer_tpu.parallel.sp import (
        build_seq_mesh, sp_forward_features)

    import dataclasses
    cfg = dataclasses.replace(
        vit_tiny_config(num_frames=2, num_classes=0, img_size=64), depth=4)
    state, core, mask = init_train_state(
        jax.random.key(1), cfg, out_dim=64, optimizer="adamw")
    rng = np.random.RandomState(1)
    B = 4
    g = rng.randn(2 * B, 3, 2, 64, 64).astype(np.float32)
    l = rng.randn(2 * B, 3, 2, 32, 32).astype(np.float32)

    step_single = make_train_step(cfg, core, mask, n_local_crops=2,
                                  donate=False)
    s1, m1 = step_single(state, jnp.asarray(g), jnp.asarray(l),
                         1e-3, 1e-4, 0.99, 0.04, False)

    mesh = build_seq_mesh(2, data=4)
    state_r = jax.device_put(state, replicated(mesh))
    fwd = partial(sp_forward_features, cfg=cfg, mesh=mesh)
    step_sp = make_train_step(cfg, core, mask, n_local_crops=2, mesh=mesh,
                              donate=False, backbone_forward=fwd)
    s2, m2 = step_sp(
        state_r,
        jax.device_put(jnp.asarray(g), data_sharding(mesh)),
        jax.device_put(jnp.asarray(l), data_sharding(mesh)),
        1e-3, 1e-4, 0.99, 0.04, False)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), abs=1e-5)
    for a, b in zip(jax.tree.leaves(s1.student),
                    jax.tree.leaves(s2.student)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_dp_tp_pp_composed_step_matches_single_device(tiny_setup):
    """dp2 x tp2 x pipe2 — all three parallelism axes composed in ONE
    train step: batch over data, Megatron TP params over model (GSPMD
    collectives), blocks pipelined over pipe (manual ppermute under
    partial-auto shard_map). Must equal the unsharded step."""
    from functools import partial

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from dino_video_summarization_transformer_tpu.parallel import (
        tp_sharding_tree)
    from dino_video_summarization_transformer_tpu.parallel.pp import (
        pp_forward_features)

    cfg, state, core, mask, g, l = tiny_setup

    step_single = make_train_step(cfg, core, mask, n_local_crops=2,
                                  donate=False)
    s1, m1 = step_single(state, jnp.asarray(g), jnp.asarray(l),
                         1e-3, 1e-4, 0.99, 0.04, False)

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 2, 2),
                ("data", "model", "pipe"))
    st_shard = tp_sharding_tree(state, mesh)
    state_s = jax.device_put(state, st_shard)
    fwd = partial(pp_forward_features, cfg=cfg, mesh=mesh, n_micro=2)
    step3 = make_train_step(cfg, core, mask, n_local_crops=2, mesh=mesh,
                            donate=False, state_sharding=st_shard,
                            backbone_forward=fwd)
    dsh = NamedSharding(mesh, P("data"))
    s2, m2 = step3(state_s,
                   jax.device_put(jnp.asarray(g), dsh),
                   jax.device_put(jnp.asarray(l), dsh),
                   1e-3, 1e-4, 0.99, 0.04, False)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), abs=1e-5)
    for a, b in zip(jax.tree.leaves(s1.student),
                    jax.tree.leaves(s2.student)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
