"""Head-sharded fused kernels under TP (parallel/tp_fused.py) vs the
single-device fused forward: value and gradient equivalence on the
virtual CPU mesh (interpret-mode kernels inside shard_map)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dino_video_summarization_transformer_tpu.models import timesformer as tsf
from dino_video_summarization_transformer_tpu.parallel import build_mesh
from dino_video_summarization_transformer_tpu.parallel.tp import (
    tp_sharding_tree)
from dino_video_summarization_transformer_tpu.parallel.tp_fused import (
    permute_qkv_tree, qkv_head_perm, tp_fused_forward_features,
    unpermute_qkv_tree)

pytestmark = pytest.mark.kernels


def _setup(depth=2):
    cfg = tsf.TimeSformerConfig(
        embed_dim=256, depth=depth, num_heads=4, img_size=32, num_frames=4,
        num_classes=0, drop_path_rate=0.0)
    params = tsf.init_timesformer(jax.random.key(0), cfg)
    x = jnp.asarray(
        np.random.RandomState(1).randn(4, 3, 4, 32, 32), jnp.float32)
    return cfg, params, x


def test_qkv_perm_roundtrip():
    D, H, tp = 256, 4, 2
    perm = qkv_head_perm(D, H, tp)
    assert sorted(perm) == list(range(3 * D))
    cfg, params, _ = _setup()
    p2 = unpermute_qkv_tree(permute_qkv_tree(params, H, tp), H, tp)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tp_fused_forward_matches_single_device_fused():
    cfg, params, x = _setup()
    fused_cfg = dataclasses.replace(cfg, use_fused=True)
    ref = np.asarray(tsf.forward_features(params, x, fused_cfg))

    mesh = build_mesh(data=4, model=2)
    pp = permute_qkv_tree(params, cfg.num_heads, 2)
    pp = jax.device_put(pp, tp_sharding_tree(pp, mesh))
    got = np.asarray(tp_fused_forward_features(
        pp, x, cfg, mesh, compute_dtype=jnp.float32))
    # per-shard partials round to bf16 before the psum (the unsharded
    # kernel rounds once, after the full-width proj) — a few bf16 ulps
    # of legitimate difference per block
    err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
    assert err < 8e-3, err


def test_tp_fused_grads_match_single_device_fused():
    cfg, params, x = _setup()
    fused_cfg = dataclasses.replace(cfg, use_fused=True)

    def loss_ref(p):
        return jnp.sum(tsf.forward_features(p, x, fused_cfg) ** 2)

    g_ref = jax.grad(loss_ref)(params)

    mesh = build_mesh(data=4, model=2)

    def loss_tp(p):
        return jnp.sum(tp_fused_forward_features(
            p, x, cfg, mesh, compute_dtype=jnp.float32) ** 2)

    pp = permute_qkv_tree(params, cfg.num_heads, 2)
    pp = jax.device_put(pp, tp_sharding_tree(pp, mesh))
    g_tp = unpermute_qkv_tree(jax.grad(loss_tp)(pp), cfg.num_heads, 2)

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_tp = {jax.tree_util.keystr(k): v
               for k, v in jax.tree_util.tree_leaves_with_path(g_tp)}
    for k, a in flat_ref:
        b = flat_tp[jax.tree_util.keystr(k)]
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        scale = np.abs(a).max() + 1e-6
        err = np.abs(a - b).max() / scale
        # bf16 partial-rounding differences (see the forward test) roughly
        # double through the recompute-in-kernel backward
        assert err < 2e-2, (jax.tree_util.keystr(k), err)


def test_tp_fused_train_step_runs_and_matches():
    """One DINO train step with the TP-fused backbone on a dp x tp mesh:
    loss matches the plain (XLA, replicated) step to kernel tolerance."""
    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P

    from dino_video_summarization_transformer_tpu.parallel import replicated
    from dino_video_summarization_transformer_tpu.parallel.tp import (
        shard_state)
    from dino_video_summarization_transformer_tpu.train.ssl import (
        init_train_state, make_train_step)

    cfg = tsf.TimeSformerConfig(
        embed_dim=256, depth=2, num_heads=4, img_size=32, num_frames=2,
        num_classes=0, drop_path_rate=0.0)
    state, core, mask = init_train_state(
        jax.random.key(0), cfg, out_dim=128, optimizer="adamw")
    mesh = build_mesh(data=4, model=2)

    rng = np.random.RandomState(0)
    B = 4
    g = jnp.asarray(rng.randn(2 * B, 3, 2, 32, 32), jnp.float32)
    l = jnp.asarray(rng.randn(2 * B, 3, 2, 32, 32), jnp.float32)

    plain = make_train_step(cfg, core, mask, n_local_crops=2, mesh=mesh,
                            donate=False)
    st0 = jax.device_put(state, replicated(mesh))
    _, m_p = plain(st0, g, l, 1e-4, 1e-4, 0.996, 0.04, True)

    st_tp = state._replace(
        student=permute_qkv_tree(state.student, cfg.num_heads, 2),
        teacher=permute_qkv_tree(state.teacher, cfg.num_heads, 2))
    sharding = tp_sharding_tree(st_tp, mesh)
    st_tp = jax.device_put(st_tp, sharding)
    fwd = partial(tp_fused_forward_features, cfg=cfg, mesh=mesh,
                  compute_dtype=jnp.float32)
    step = make_train_step(cfg, core, mask, n_local_crops=2, mesh=mesh,
                           donate=False, state_sharding=sharding,
                           backbone_forward=fwd)
    dsh = NamedSharding(mesh, P("data"))
    st1, m_t = step(st_tp, jax.device_put(g, dsh), jax.device_put(l, dsh),
                    1e-4, 1e-4, 0.996, 0.04, True)
    assert np.isfinite(float(m_t["loss"]))
    np.testing.assert_allclose(float(m_p["loss"]), float(m_t["loss"]),
                               rtol=2e-3)
