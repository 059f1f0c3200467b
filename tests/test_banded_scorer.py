"""FrameScorer band_mode integration: the banded one-pass scoring path.

Pins: the "teacher" hybrid collapses to the exact path when the video
length equals the global window (degenerate banded == windowed parity,
end to end through the scorer), segmentation with a sufficient halo is
exact, the wire dtypes agree, and the group path matches per-video."""

import dataclasses

import numpy as np
import pytest

from dino_video_summarization_transformer_tpu.data.windows import window_indices
from dino_video_summarization_transformer_tpu.engine.scoring import FrameScorer
from dino_video_summarization_transformer_tpu.utils.synthetic import make_video


@pytest.fixture(scope="module")
def setup():
    import jax
    import jax.numpy as jnp

    from dino_video_summarization_transformer_tpu.models import (
        init_timesformer, vit_tiny_config)

    cfg = vit_tiny_config(num_frames=8, num_classes=0, img_size=32)
    params = dict(init_timesformer(jax.random.key(0), cfg))
    # constant time embedding: the banded pass's center-te choice becomes
    # exact, so the degenerate-window equality holds end to end
    params["time_embed"] = jnp.zeros_like(params["time_embed"])

    def scorer(**kw):
        kw.setdefault("compute_dtype", np.float32)
        return FrameScorer(params, cfg, chunk=8, precision=None, **kw)

    return scorer, params, cfg


def test_band_teacher_hybrid_exact_when_video_equals_window(setup):
    """T == global_size: every frame's global window is the whole video,
    so the banded teacher rows equal the windowed teacher rows and the
    hybrid must reproduce the exact path's losses."""
    scorer, _, _ = setup
    T = 30
    vid = make_video(0, T, 32)
    loc, glob, eff = window_indices(T, 3, 30)
    exact = scorer().score_video(vid, loc, glob, eff)
    hybrid = scorer(band_mode="teacher").score_video(vid, loc, glob, eff)
    np.testing.assert_allclose(exact, hybrid, rtol=5e-3, atol=1e-5)


def test_band_both_finite_and_correlated(setup):
    scorer, _, _ = setup
    T = 100
    vid = make_video(0, T, 32)
    loc, glob, eff = window_indices(T, 3, 30)
    exact = scorer().score_video(vid, loc, glob, eff)
    sc = scorer(band_mode="both")
    both = sc.score_video(vid, loc, glob, eff)
    assert both.shape == (T,)
    assert np.all(np.isfinite(both)) and both.min() > 0
    assert sc.stats["band_teacher_frames"] >= T
    assert sc.stats["band_student_frames"] >= T
    assert sc.stats["band_flops"] > 0
    # random-init tiny model on synthetic frames: only a loose rank
    # sanity here; quality is judged by tools/validate_fast_scoring.py
    ra = np.argsort(np.argsort(exact)).astype(float)
    rb = np.argsort(np.argsort(both)).astype(float)
    ra -= ra.mean()
    rb -= rb.mean()
    rho = (ra * rb).sum() / np.sqrt((ra * ra).sum() * (rb * rb).sum())
    assert rho > 0.2, rho


def test_band_segmentation_matches_single_pass():
    """With depth 1 the total information reach is (eff//2 temporal +
    eff//2 CLS window) = 30 <= halo 32, so segmented and single-pass
    banded scoring must agree exactly on every frame."""
    import jax

    from dino_video_summarization_transformer_tpu.models import (
        vit_tiny_config, init_timesformer)

    cfg = dataclasses.replace(
        vit_tiny_config(num_frames=8, num_classes=0, img_size=32), depth=1)
    params = init_timesformer(jax.random.key(1), cfg)
    T = 300
    vid = make_video(1, T, 32)
    loc, glob, eff = window_indices(T, 3, 30)

    def scorer(**kw):
        return FrameScorer(params, cfg, chunk=8, precision=None,
                           compute_dtype=np.float32, band_mode="both", **kw)

    one = scorer(band_chunk=512).score_video(vid, loc, glob, eff)
    seg = scorer(band_chunk=128, band_halo=32).score_video(vid, loc, glob, eff)
    np.testing.assert_allclose(one, seg, rtol=1e-4, atol=1e-6)


def test_band_uint8_wire_matches_float(setup):
    scorer, _, _ = setup
    T = 40
    vid = make_video(2, T, 32)
    loc, glob, eff = window_indices(T, 3, 30)
    mean = np.array([0.45, 0.45, 0.45], np.float32)
    std = np.array([0.225, 0.225, 0.225], np.float32)
    vf = ((vid.astype(np.float32) / 255.0) - mean) / std
    a = scorer(band_mode="both").score_video(vid, loc, glob, eff)
    b = scorer(band_mode="both").score_video(vf, loc, glob, eff)
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


def test_band_group_matches_per_video(setup):
    scorer, _, _ = setup
    sc = scorer(band_mode="both")
    items = []
    for s in range(3):
        T = 40 + 10 * s
        vid = make_video(s, T, 32)
        loc, glob, eff = window_indices(T, 3, 30)
        items.append(dict(frames=vid, local_idx=loc, global_idx=glob,
                          eff_global=eff, dummy=False))
    grouped = [h.fetch() for h in sc.score_group_async(items)]
    for it, g in zip(items, grouped):
        solo = sc.score_video(it["frames"], it["local_idx"],
                              it["global_idx"], it["eff_global"])
        np.testing.assert_array_equal(solo, g)


def test_band_mode_rejects_strided_knobs(setup):
    scorer, _, _ = setup
    with pytest.raises(ValueError, match="band_mode"):
        scorer(band_mode="both", teacher_stride=4)
    with pytest.raises(ValueError, match="band_halo"):
        scorer(band_mode="both", band_halo=4)
