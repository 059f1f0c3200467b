"""Pipeline parallelism (parallel/pp.py): the GPipe-style block-stack
pipeline must be value- AND gradient-equal to the plain lax.scan forward.

The reference has no pipeline parallelism (SURVEY.md section 2.4 — DP
only); this is a TPU-native scaling capability, validated on the
8-virtual-device CPU mesh the way the other mesh features are
(test_sharding.py pattern).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dino_video_summarization_transformer_tpu.models import (
    forward_features, init_timesformer, vit_tiny_config)
from dino_video_summarization_transformer_tpu.parallel import (
    build_pipe_mesh, pipeline_apply, pp_forward_features)


def _setup(depth_cfg_kw=None):
    # depth 8 (not the full 12): compile time scales with the block
    # count and dominates this file's wall time; 2 blocks per pipe
    # stage / shard keeps every boundary case exercised
    import dataclasses
    cfg = dataclasses.replace(
        vit_tiny_config(num_frames=2, num_classes=0, img_size=32),
        depth=8)
    params = init_timesformer(jax.random.key(0), cfg)
    assert jax.tree.leaves(params["blocks"])[0].shape[0] % 4 == 0, (
        "test assumes depth divisible by pipe=4")
    x = jnp.asarray(
        np.random.RandomState(0).randn(4, 3, 2, 32, 32), jnp.float32)
    return cfg, params, x


@pytest.mark.parametrize("n_micro", [1, 2, 4])
def test_pp_forward_matches_scan(n_micro):
    cfg, params, x = _setup()
    mesh = build_pipe_mesh(pipe=4, data=2)

    ref = forward_features(params, x, cfg)
    got = pp_forward_features(params, x, cfg, mesh, n_micro=n_micro)
    # microbatch shapes change XLA fusion/reduction order: f32-noise only
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pp_grads_match_scan():
    cfg, params, x = _setup()
    mesh = build_pipe_mesh(pipe=4, data=2)

    def loss_ref(p):
        return jnp.sum(forward_features(p, x, cfg) ** 2)

    def loss_pp(p):
        return jnp.sum(pp_forward_features(p, x, cfg, mesh, n_micro=2) ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_pp = jax.grad(loss_pp)(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pp = jax.tree.leaves(g_pp)
    assert len(flat_ref) == len(flat_pp)
    for (path, a), b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4,
            err_msg=jax.tree_util.keystr(path))


def test_pipeline_apply_generic_stack():
    """pipeline_apply on a plain residual-MLP stack: 8 layers over 8 stages
    (pipe == device count, one block per stage)."""
    rng = np.random.RandomState(1)
    depth, B, D = 8, 8, 16
    blocks = {"w": jnp.asarray(rng.randn(depth, D, D) * 0.1, jnp.float32),
              "b": jnp.asarray(rng.randn(depth, D) * 0.1, jnp.float32)}
    x = jnp.asarray(rng.randn(B, D), jnp.float32)

    def block_fn(bp, c):
        return c + jnp.tanh(c @ bp["w"] + bp["b"])

    ref = x
    for i in range(depth):
        ref = block_fn(jax.tree.map(lambda a: a[i], blocks), ref)

    mesh = build_pipe_mesh(pipe=8, data=1)
    got = pipeline_apply(blocks, x, block_fn, mesh, n_micro=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_apply_tuple_carry():
    """Tuple-pytree carries (the divided block's (cls, grid) split) flow
    through injection/permute/collection correctly."""
    rng = np.random.RandomState(2)
    depth, B, D = 4, 4, 8
    blocks = {"w": jnp.asarray(rng.randn(depth, D, D) * 0.1, jnp.float32)}
    a = jnp.asarray(rng.randn(B, D), jnp.float32)
    b = jnp.asarray(rng.randn(B, 3, D), jnp.float32)

    def block_fn(bp, c):
        ca, cb = c
        return ca + cb.mean(axis=1) @ bp["w"], cb + (ca @ bp["w"])[:, None, :]

    ref = (a, b)
    for i in range(depth):
        ref = block_fn(jax.tree.map(lambda t: t[i], blocks), ref)

    mesh = build_pipe_mesh(pipe=4, data=2)
    got = pipeline_apply(blocks, (a, b), block_fn, mesh, n_micro=2)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-6, atol=1e-6)
