"""Mixed-precision teacher (ScorerConfig.teacher_dtype): the teacher
forward runs f32 while students stay bf16. The teacher softmax at temp
0.02 is the score's sharpest noise amplifier, and in the strided modes
the teacher is 1/k of the FLOPs — so teacher precision is the cheap half
to buy back. These tests pin mechanism + the quality direction on CPU;
throughput and the validator composite row are measured on TPU."""

import numpy as np

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from dino_video_summarization_transformer_tpu.data.windows import (
    window_indices)
from dino_video_summarization_transformer_tpu.engine.scoring import (
    FrameScorer)
from dino_video_summarization_transformer_tpu.models import timesformer as tsf


def _setup(seed=0, T=44):
    from dino_video_summarization_transformer_tpu.utils.synthetic import (
        make_numpy_params, make_video)

    cfg = tsf.TimeSformerConfig(
        img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=2,
        num_frames=4, num_classes=0)
    params = make_numpy_params(cfg, seed)
    vid = make_video(seed=2, T=T, size=32)
    frames = ((vid.astype(np.float32) / 255.0 - 0.45) / 0.225) \
        if vid.dtype == np.uint8 else vid.astype(np.float32)
    loc, glob, eff = window_indices(T, 3, 30)
    return cfg, params, frames, loc, glob, eff


def test_teacher_dtype_none_is_identity():
    cfg, params, frames, loc, glob, eff = _setup()
    a = FrameScorer(params, cfg, chunk=8, compute_dtype=np.float32,
                    precision=None)
    b = FrameScorer(params, cfg, chunk=8, compute_dtype=np.float32,
                    precision=None, teacher_dtype=np.float32)
    np.testing.assert_array_equal(a.score_video(frames, loc, glob, eff),
                                  b.score_video(frames, loc, glob, eff))


def test_mixed_teacher_strided_runs_and_matches_direction():
    """bf16 students + f32 teacher at stride 2 must land closer to the f32
    oracle than full bf16 does (mean relative error), in both the exact
    and the strided dispatch paths."""
    cfg, params, frames, loc, glob, eff = _setup()
    oracle = FrameScorer(params, cfg, chunk=8, compute_dtype=np.float32,
                         precision=None)
    want = oracle.score_video(frames, loc, glob, eff)

    def rel_err(scorer):
        got = scorer.score_video(frames, loc, glob, eff)
        assert np.isfinite(got).all()
        return float(np.abs(got - want).mean() / np.abs(want).mean())

    e_bf16 = rel_err(FrameScorer(params, cfg, chunk=8,
                                 compute_dtype=jnp.bfloat16, precision=None))
    e_mixed = rel_err(FrameScorer(params, cfg, chunk=8,
                                  compute_dtype=jnp.bfloat16, precision=None,
                                  teacher_dtype=np.float32))
    assert e_mixed < e_bf16, (e_mixed, e_bf16)

    o2 = FrameScorer(params, cfg, chunk=8, compute_dtype=np.float32,
                     precision=None, teacher_stride=2)
    want2 = o2.score_video(frames, loc, glob, eff)

    def rel_err2(scorer):
        got = scorer.score_video(frames, loc, glob, eff)
        assert np.isfinite(got).all()
        return float(np.abs(got - want2).mean() / np.abs(want2).mean())

    s_bf16 = rel_err2(FrameScorer(params, cfg, chunk=8, teacher_stride=2,
                                  compute_dtype=jnp.bfloat16, precision=None))
    s_mixed = rel_err2(FrameScorer(params, cfg, chunk=8, teacher_stride=2,
                                   compute_dtype=jnp.bfloat16, precision=None,
                                   teacher_dtype=np.float32))
    assert s_mixed < s_bf16, (s_mixed, s_bf16)


def test_mixed_teacher_group_matches_per_video():
    """The cross-video group path carries the params pair identically."""
    cfg, params, frames, loc, glob, eff = _setup()
    sc = FrameScorer(params, cfg, chunk=8, teacher_stride=2,
                     compute_dtype=jnp.bfloat16, precision=None,
                     teacher_dtype=np.float32)
    items = []
    for s, T in ((5, 36), (6, 40)):
        from dino_video_summarization_transformer_tpu.utils.synthetic import (
            make_video)

        vid = make_video(seed=s, T=T, size=32).astype(np.float32)
        l, g, e = window_indices(T, 3, 30)
        items.append({"path": f"v{s}.mp4", "dummy": False, "frames": vid,
                      "local_idx": l, "global_idx": g, "eff_global": e})
    got = sc.score_group_async(items)
    for item, handle in zip(items, got):
        want = sc.score_item(item)
        np.testing.assert_allclose(handle.fetch(), want, atol=1e-5,
                                   err_msg=item["path"])
