"""Multi-chip scoring (single process, no collectives): scorers pinned to
distinct local devices via ScorerConfig.device must produce bit-identical
losses, and run_scoring's round-robin over them must export the same JSON
as a single scorer. Runs on the 8-virtual-device CPU mesh (conftest sets
--xla_force_host_platform_device_count=8), the same fake backend the
multi-chip train dryrun uses.

TPU-native rationale (SURVEY §5 long-context): per-frame scoring is
embarrassingly parallel over videos, so intra-host scaling is replica
dispatch — not sharded arrays — while --num_shards still splits across
hosts like the reference's torch.distributed.launch
(ref: scripts/dino_similarity_*.sh).
"""

import json

import numpy as np

import conftest  # noqa: F401

import jax

from dino_video_summarization_transformer_tpu.data.windows import (
    window_indices)
from dino_video_summarization_transformer_tpu.engine.scoring import (
    FrameScorer, make_scorers, run_scoring)
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


def test_make_scorers_pins_devices():
    params, cfg = _params_cfg()
    scorers = make_scorers(params, cfg, n_devices=0, chunk=8)
    devs = jax.local_devices()
    assert len(scorers) == len(devs)
    for s, d in zip(scorers, devs):
        leaf = jax.tree.leaves(s.params)[0]
        assert leaf.devices() == {d}


def test_pinned_scorer_matches_default_device():
    """Same params, same video: a scorer pinned to a non-default device
    must produce the same losses as the default-device scorer (the CPU
    'devices' share one backend, so this is bitwise)."""
    params, cfg = _params_cfg()
    item = _item(20, 36)
    base = FrameScorer(params, cfg, chunk=8)
    pinned = FrameScorer(params, cfg, chunk=8,
                         device=jax.local_devices()[-1])
    np.testing.assert_array_equal(base.score_item(item),
                                  pinned.score_item(item))


def test_pinned_scorer_strided_matches():
    params, cfg = _params_cfg()
    item = _item(21, 40)
    base = FrameScorer(params, cfg, chunk=8, teacher_stride=2)
    pinned = FrameScorer(params, cfg, chunk=8, teacher_stride=2,
                         device=jax.local_devices()[2])
    np.testing.assert_array_equal(base.score_item(item),
                                  pinned.score_item(item))


def test_run_scoring_multichip_export(tmp_path):
    """run_scoring over 4 device-pinned scorers == single-scorer export.
    group_videos=1 forces one group per video so every scorer gets work."""
    params, cfg = _params_cfg()
    items = [_item(s, T) for s, T in
             zip(range(30, 36), (36, 33, 40, 14, 35, 38))]

    single = FrameScorer(params, cfg, chunk=8, teacher_stride=2)
    want_path = str(tmp_path / "single.json")
    run_scoring(items, single, want_path, num_workers=0, log_every=0)

    scorers = make_scorers(params, cfg, n_devices=4, chunk=8,
                           teacher_stride=2)
    assert len(scorers) == 4
    got_path = str(tmp_path / "multi.json")
    run_scoring(items, scorers, got_path, num_workers=0, log_every=0,
                group_videos=1)

    with open(want_path) as f:
        want = json.load(f)
    with open(got_path) as f:
        got = json.load(f)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-6, err_msg=k)
