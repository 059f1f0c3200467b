"""Sequence parallelism (parallel/sp.py): the Ulysses-style divided-block
resharding must be value- AND gradient-equal to the plain forward.

The reference has no sequence/context parallelism (SURVEY.md section 5);
this is a TPU-native scaling capability, validated on the 8-virtual-device
CPU mesh like the other mesh features.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dino_video_summarization_transformer_tpu.models import (
    forward_features, init_timesformer, vit_tiny_config)
from dino_video_summarization_transformer_tpu.parallel import (
    build_seq_mesh, sp_forward_features)


def _setup(num_frames=4):
    # img 32 / patch 16 -> N=4; T=4: both divisible by seq=2 and 4
    # depth 8 (not the full 12): compile time scales with the block count
    # and dominates this file's wall time; the sharded-block semantics
    # don't depend on depth
    import dataclasses
    cfg = dataclasses.replace(
        vit_tiny_config(num_frames=num_frames, num_classes=0,
                        img_size=32), depth=8)
    params = init_timesformer(jax.random.key(0), cfg)
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 3, num_frames, 32, 32),
        jnp.float32)
    return cfg, params, x


@pytest.mark.parametrize("seq,data", [(2, 4), (4, 2)])
def test_sp_forward_matches_scan(seq, data):
    cfg, params, x = _setup()
    mesh = build_seq_mesh(seq=seq, data=data)

    ref = forward_features(params, x, cfg)
    got = sp_forward_features(params, x, cfg, mesh)
    # resharded shapes change XLA fusion/reduction order: f32-noise only
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_sp_grads_match_scan():
    cfg, params, x = _setup()
    mesh = build_seq_mesh(seq=2, data=4)

    def loss_ref(p):
        return jnp.sum(forward_features(p, x, cfg) ** 2)

    def loss_sp(p):
        return jnp.sum(sp_forward_features(p, x, cfg, mesh) ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_sp = jax.grad(loss_sp)(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_sp = jax.tree.leaves(g_sp)
    assert len(flat_ref) == len(flat_sp)
    for (path, a), b in zip(flat_ref, flat_sp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4,
            err_msg=jax.tree_util.keystr(path))


def test_sp_rejects_indivisible_geometry():
    cfg, params, x = _setup(num_frames=2)  # T=2 not divisible by seq=4
    mesh = build_seq_mesh(seq=4, data=2)
    with pytest.raises(AssertionError):
        sp_forward_features(params, x, cfg, mesh)


def test_sp_train_step_matches_plain():
    """dp x sp TRAIN STEP (VERDICT r4 next-#7): the sequence-parallel
    forward hooked into make_train_step must produce the same loss and
    updated params as the plain data-parallel step — the SP gradient
    path end to end, not just the forward."""
    import dataclasses
    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P

    from dino_video_summarization_transformer_tpu.parallel import replicated
    from dino_video_summarization_transformer_tpu.train.ssl import (
        init_train_state, make_train_step)

    cfg = dataclasses.replace(
        vit_tiny_config(num_frames=2, num_classes=0, img_size=64), depth=4)
    state, core, mask = init_train_state(
        jax.random.key(0), cfg, out_dim=128, optimizer="adamw")
    mesh = build_seq_mesh(seq=2, data=4)

    rng = np.random.RandomState(0)
    B = 4
    g = jnp.asarray(rng.randn(2 * B, 3, 2, 64, 64), jnp.float32)
    l = jnp.asarray(rng.randn(2 * B, 3, 2, 32, 32), jnp.float32)

    plain_step = make_train_step(cfg, core, mask, n_local_crops=2,
                                 mesh=mesh, donate=False)
    st0 = jax.device_put(state, replicated(mesh))
    st_p, m_p = plain_step(st0, g, l, 1e-4, 1e-4, 0.996, 0.04, True)

    sp_fwd = partial(sp_forward_features, cfg=cfg, mesh=mesh)
    sp_step = make_train_step(cfg, core, mask, n_local_crops=2,
                              mesh=mesh, donate=False,
                              backbone_forward=sp_fwd)
    st0 = jax.device_put(state, replicated(mesh))
    dsh = NamedSharding(mesh, P("data"))
    st_s, m_s = sp_step(st0, jax.device_put(g, dsh), jax.device_put(l, dsh),
                        1e-4, 1e-4, 0.996, 0.04, True)

    np.testing.assert_allclose(float(m_p["loss"]), float(m_s["loss"]),
                               rtol=1e-5)
    a = jax.tree.leaves(st_p.student)[0]
    b = jax.tree.leaves(st_s.student)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-6)
