"""Int8 W8A8 teacher tier (ops/quant.py + the q8 whole-block kernels).

Mechanism tests on CPU: weight quantization roundtrip, the int8_linear
XLA path (what `models.timesformer.linear` dispatches to when a tree
carries qkernel), the q8 whole-block Pallas kernels in interpreter mode
against the XLA int8 forward, and the FrameScorer plumbing
(teacher_quant="int8" — students untouched, teacher quantized). Speed and
the composite-vs-floor quality row are measured on TPU
(tools/validate_fast_scoring.py) before any default promotion.
Ref protocol being approximated: /root/reference/dino_similarity.py:82-84.
"""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from dino_video_summarization_transformer_tpu.data.windows import (
    window_indices)
from dino_video_summarization_transformer_tpu.engine.scoring import (
    FrameScorer)
from dino_video_summarization_transformer_tpu.models import timesformer as tsf
from dino_video_summarization_transformer_tpu.ops import quant


def test_quantize_dequantize_roundtrip():
    w = np.asarray(jax.random.normal(jax.random.key(0), (3, 64, 128)))
    p = {"kernel": w, "bias": np.zeros((3, 128), np.float32)}
    q = quant.quantize_dense(p)
    assert q["qkernel"].dtype == jnp.int8
    assert q["qscale"].shape == (3, 128)
    back = np.asarray(quant.dequantize_dense(q)["kernel"])
    # symmetric per-channel int8: max error is scale/2 = amax/254
    amax = np.abs(w).max(axis=-2, keepdims=True)
    assert (np.abs(back - w) <= amax / 254 + 1e-7).all()


def test_int8_linear_matches_float():
    k1, k2 = jax.random.split(jax.random.key(1))
    p = {"kernel": 0.1 * jax.random.normal(k1, (64, 96)),
         "bias": 0.01 * jnp.ones((96,))}
    x = jax.random.normal(k2, (5, 7, 64))
    want = np.asarray(x @ p["kernel"] + p["bias"])
    got = np.asarray(quant.int8_linear(quant.quantize_dense(p), x))
    # W8A8 dynamic: ~1% relative error on random gaussians
    err = np.abs(got - want).mean() / np.abs(want).mean()
    assert err < 2e-2, err


def _tiny(seed=0, D=128, H=2, depth=2, T=4):
    from dino_video_summarization_transformer_tpu.utils.synthetic import (
        make_numpy_params)

    cfg = tsf.TimeSformerConfig(
        img_size=32, patch_size=16, embed_dim=D, depth=depth, num_heads=H,
        num_frames=T, num_classes=0)
    return cfg, make_numpy_params(cfg, seed)


def test_quantized_tree_structure_and_sharing():
    cfg, params = _tiny()
    qp = quant.quantize_tree_int8(params)
    assert "qkernel" in qp["blocks"]["attn"]["qkv"]
    assert "kernel" not in qp["blocks"]["mlp"]["fc1"]
    assert "qkernel" in qp["blocks"]["temporal_fc"]
    # input/output layers untouched (leaves shared, not copied)
    assert qp["patch_embed"]["proj"]["kernel"] is \
        params["patch_embed"]["proj"]["kernel"]
    assert "kernel" not in qp["blocks"]["attn"]["qkv"]


def test_forward_quantized_tracks_f32():
    """The XLA path: linear() dispatches on qkernel; the quantized forward
    must track the f32 forward within W8A8 error (features, not logits)."""
    cfg, params = _tiny()
    x = np.asarray(jax.random.normal(jax.random.key(3), (2, 3, 4, 32, 32)),
                   np.float32)
    want = np.asarray(tsf.forward(params, x, cfg))
    got = np.asarray(tsf.forward(quant.quantize_tree_int8(params), x, cfg))
    cos = (want * got).sum(-1) / (
        np.linalg.norm(want, axis=-1) * np.linalg.norm(got, axis=-1))
    assert cos.min() > 0.99, cos.min()
    err = np.abs(got - want).mean() / np.abs(want).mean()
    assert err < 0.1, err


@pytest.mark.kernels
def test_wb_kernels_match_xla_int8():
    """The q8 whole-block kernel pair (interpret mode on CPU) == the XLA
    int8 forward within fused-kernel tolerance: same int8 weights, same
    per-token activation quantization, different code."""
    cfg, params = _tiny()
    qp = quant.quantize_tree_int8(
        jax.tree.map(jnp.asarray, params))
    x = np.asarray(
        jax.random.normal(jax.random.key(4), (2, 3, 4, 32, 32)), np.float32)
    want = np.asarray(
        tsf.forward(qp, x, cfg, compute_dtype=jnp.bfloat16), np.float32)
    import dataclasses

    cfg_f = dataclasses.replace(cfg, use_fused=True, fused_wb=True)
    got = np.asarray(
        tsf.forward(qp, x, cfg_f, compute_dtype=jnp.bfloat16), np.float32)
    np.testing.assert_allclose(got, want, atol=8e-2, rtol=8e-2)


def test_scorer_teacher_quant_runs_and_tracks():
    """FrameScorer(teacher_quant="int8"): runs end-to-end, scores finite
    and rank-correlated with the unquantized scorer; students untouched."""
    from dino_video_summarization_transformer_tpu.utils.synthetic import (
        make_numpy_params, make_video)

    cfg = tsf.TimeSformerConfig(
        img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=2,
        num_frames=4, num_classes=0)
    params = make_numpy_params(cfg, 0)
    vid = make_video(seed=2, T=40, size=32).astype(np.float32)
    loc, glob, eff = window_indices(40, 3, 30)

    base = FrameScorer(params, cfg, chunk=8, compute_dtype=np.float32,
                       precision=None)
    q = FrameScorer(params, cfg, chunk=8, compute_dtype=np.float32,
                    precision=None, teacher_quant="int8")
    assert "qkernel" in q.t_params["blocks"]["attn"]["qkv"]
    assert "kernel" in q.params["blocks"]["attn"]["qkv"]

    want = base.score_video(vid, loc, glob, eff)
    got = q.score_video(vid, loc, glob, eff)
    assert np.isfinite(got).all()
    # int8 teacher perturbs the temp-0.02 softmax target; demand rank
    # agreement (what selection consumes), not numeric closeness
    from scipy.stats import spearmanr

    rho = spearmanr(want, got).statistic
    assert rho > 0.9, rho


def test_scorer_teacher_quant_strided():
    """The strided (turbo) dispatch carries the quantized teacher tree."""
    from dino_video_summarization_transformer_tpu.utils.synthetic import (
        make_numpy_params, make_video)

    cfg = tsf.TimeSformerConfig(
        img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=2,
        num_frames=4, num_classes=0)
    params = make_numpy_params(cfg, 0)
    vid = make_video(seed=3, T=36, size=32).astype(np.float32)
    loc, glob, eff = window_indices(36, 3, 30)
    sc = FrameScorer(params, cfg, chunk=8, teacher_stride=2,
                     compute_dtype=np.float32, precision=None,
                     teacher_quant="int8")
    got = sc.score_video(vid, loc, glob, eff)
    assert got.shape == (36,) and np.isfinite(got).all()


def test_scorer_student_quant_runs_and_tracks():
    """FrameScorer(student_quant="int8") — the r4 roofline lever: students
    quantized, teacher untouched; scores finite and rank-correlated with
    the unquantized scorer. The student temp (0.3) is 15x softer than the
    teacher's, so rank agreement should be at least as good as the
    teacher-quant case."""
    from dino_video_summarization_transformer_tpu.utils.synthetic import (
        make_numpy_params, make_video)

    cfg = tsf.TimeSformerConfig(
        img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=2,
        num_frames=4, num_classes=0)
    params = make_numpy_params(cfg, 0)
    vid = make_video(seed=2, T=40, size=32).astype(np.float32)
    loc, glob, eff = window_indices(40, 3, 30)

    base = FrameScorer(params, cfg, chunk=8, compute_dtype=np.float32,
                       precision=None)
    q = FrameScorer(params, cfg, chunk=8, compute_dtype=np.float32,
                    precision=None, student_quant="int8")
    assert "qkernel" in q.params["blocks"]["attn"]["qkv"]
    assert "kernel" in q.t_params["blocks"]["attn"]["qkv"]

    want = base.score_video(vid, loc, glob, eff)
    got = q.score_video(vid, loc, glob, eff)
    assert np.isfinite(got).all()
    from scipy.stats import spearmanr

    rho = spearmanr(want, got).statistic
    assert rho > 0.9, rho


def test_scorer_student_quant_strided_with_f32_teacher():
    """The candidate default's plumbing (turbo2e-mt-q8s): int8 students +
    f32 teacher + stride + refinement run end to end through the strided
    dispatch; the teacher tree stays float, the student tree int8."""
    from dino_video_summarization_transformer_tpu.utils.synthetic import (
        make_numpy_params, make_video)

    cfg = tsf.TimeSformerConfig(
        img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=2,
        num_frames=4, num_classes=0)
    params = make_numpy_params(cfg, 0)
    vid = make_video(seed=3, T=36, size=32).astype(np.float32)
    loc, glob, eff = window_indices(36, 3, 30)
    sc = FrameScorer(params, cfg, chunk=8, teacher_stride=2,
                     teacher_interp="catmullrom", teacher_refine=0.035,
                     compute_dtype=np.float32, precision=None,
                     teacher_dtype=jnp.float32, student_quant="int8")
    assert "qkernel" in sc.params["blocks"]["attn"]["qkv"]
    assert "kernel" in sc.t_params["blocks"]["attn"]["qkv"]
    assert sc.t_params["blocks"]["attn"]["qkv"]["kernel"].dtype == jnp.float32
    got = sc.score_video(vid, loc, glob, eff)
    assert got.shape == (36,) and np.isfinite(got).all()


def test_scorer_both_quant():
    """Economy tier: both trees int8 (turbo2-q8sq8t plumbing)."""
    from dino_video_summarization_transformer_tpu.utils.synthetic import (
        make_numpy_params, make_video)

    cfg = tsf.TimeSformerConfig(
        img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=2,
        num_frames=4, num_classes=0)
    params = make_numpy_params(cfg, 0)
    vid = make_video(seed=4, T=24, size=32).astype(np.float32)
    loc, glob, eff = window_indices(24, 3, 30)
    sc = FrameScorer(params, cfg, chunk=8, teacher_stride=2,
                     compute_dtype=np.float32, precision=None,
                     teacher_quant="int8", student_quant="int8")
    assert "qkernel" in sc.params["blocks"]["attn"]["qkv"]
    assert "qkernel" in sc.t_params["blocks"]["attn"]["qkv"]
    got = sc.score_video(vid, loc, glob, eff)
    assert got.shape == (24,) and np.isfinite(got).all()
