"""Cross-video group scoring (VERDICT r2 next-#2): chunks shared across
video boundaries must produce the SAME per-video losses as the per-video
paths — the batching is purely a dispatch-packing change."""

import numpy as np

import conftest  # noqa: F401

import jax.numpy as jnp

from dino_video_summarization_transformer_tpu.data.windows import (
    window_indices)
from dino_video_summarization_transformer_tpu.engine.scoring import (
    FrameScorer, run_scoring)
from dino_video_summarization_transformer_tpu.models import timesformer as tsf


def _params_cfg(seed=0):
    from dino_video_summarization_transformer_tpu.utils.synthetic import (
        make_numpy_params)

    cfg = tsf.TimeSformerConfig(
        img_size=224, patch_size=16, embed_dim=32, depth=1, num_heads=2,
        num_frames=4, num_classes=0)
    return make_numpy_params(cfg, seed), cfg


def _item(seed, T):
    rng = np.random.RandomState(seed)
    frames = rng.randn(T, 224, 224, 3).astype(np.float32)
    loc, glob, eff = window_indices(T, 3, 30)
    return {"path": f"vid{seed}.mp4", "dummy": False, "frames": frames,
            "local_idx": loc, "global_idx": glob, "eff_global": eff}


def test_group_exact_matches_per_video():
    params, cfg = _params_cfg()
    scorer = FrameScorer(params, cfg, chunk=8)
    items = [_item(1, 34), _item(2, 41), _item(3, 33)]
    got = scorer.score_group_async(items)
    for item, handle in zip(items, got):
        want = scorer.score_item(item)
        np.testing.assert_allclose(handle.fetch(), want, atol=1e-5,
                                   err_msg=item["path"])


def test_group_strided_matches_per_video():
    params, cfg = _params_cfg()
    scorer = FrameScorer(params, cfg, chunk=8, teacher_stride=2,
                         score_stride=2)
    items = [_item(4, 40), _item(5, 35), _item(6, 44)]
    got = scorer.score_group_async(items)
    for item, handle in zip(items, got):
        want = scorer.score_item(item)
        np.testing.assert_allclose(handle.fetch(), want, atol=1e-5,
                                   err_msg=item["path"])


def test_group_mixed_dummy_and_short():
    """Dummies and geometry-mismatched (short, eff_global-clamped) videos
    inside a group take their own paths; values must be unchanged."""
    params, cfg = _params_cfg()
    scorer = FrameScorer(params, cfg, chunk=8, teacher_stride=2)
    short = _item(7, 14)  # T < 30 -> eff_global = 14, its own geometry
    dummy = {"path": "bad.mp4", "dummy": True, "frames": None,
             "local_idx": None, "global_idx": None, "eff_global": 1}
    items = [_item(8, 36), dummy, short, _item(9, 38)]
    got = scorer.score_group_async(items)
    np.testing.assert_allclose(got[1].fetch(), scorer.dummy_losses())
    for i in (0, 2, 3):
        want = scorer.score_item(items[i])
        np.testing.assert_allclose(got[i].fetch(), want, atol=1e-5,
                                   err_msg=items[i]["path"])


def test_run_scoring_grouped_export(tmp_path):
    """run_scoring's group batching exports the same JSON as per-item
    scoring (list-backed dataset, no decoder needed)."""
    import json

    params, cfg = _params_cfg()
    scorer = FrameScorer(params, cfg, chunk=8, teacher_stride=2)
    items = [_item(10, 36), _item(11, 33), _item(12, 40)]
    out = str(tmp_path / "loss.json")
    run_scoring(items, scorer, out, num_workers=0, log_every=0)
    with open(out) as f:
        data = json.load(f)
    assert set(data) == {"vid10", "vid11", "vid12"}
    for item in items:
        key = item["path"].rsplit(".", 1)[0]
        want = scorer.score_item(item)
        np.testing.assert_allclose(data[key], want, atol=1e-5)
