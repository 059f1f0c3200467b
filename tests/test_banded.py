"""Banded one-pass forward: math pins vs the windowed forward.

The degenerate case (video length == window length, constant time
embedding) makes every frame's clamp-shifted window the whole video, so
the banded pass must reproduce the windowed forward EXACTLY for every
frame — this pins the temporal band masks, the per-frame CLS spatial
protocol, the cross-frame CLS aggregation, and the residual/MLP wiring
in one equality (ref semantics: models/timesformer.py:116-185,
dino_loss_loader.py:126-171)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dino_video_summarization_transformer_tpu.models import banded
from dino_video_summarization_transformer_tpu.models import timesformer as tsf
from dino_video_summarization_transformer_tpu.data.windows import window_indices


def _params(cfg, seed=0, zero_te=True):
    p = dict(tsf.init_timesformer(jax.random.PRNGKey(seed), cfg))
    if zero_te:
        p["time_embed"] = jnp.zeros_like(p["time_embed"])
    return p


def _frames(T, img, seed=1):
    rng = np.random.RandomState(seed)
    return rng.randn(T, img, img, 3).astype(np.float32)


@pytest.mark.parametrize("eff,block", [(3, 4), (8, 4)])
def test_degenerate_window_equivalence(eff, block):
    cfg = tsf.vit_tiny_config(img_size=32, num_frames=8, drop_path_rate=0.0)
    params = _params(cfg)
    T = eff
    frames = _frames(T, cfg.img_size)
    clip = jnp.asarray(frames.transpose(3, 0, 1, 2)[None])  # (1, C, T, H, W)
    ref = np.asarray(tsf.forward(params, clip, cfg))        # (1, D)
    got = np.asarray(banded.banded_cls_features(
        params, jnp.asarray(frames), T, cfg, eff=eff, block=block))
    assert got.shape == (T, cfg.embed_dim)
    np.testing.assert_allclose(
        got, np.broadcast_to(ref, got.shape), atol=3e-5, rtol=1e-4)


def test_band_starts_match_window_indices():
    for T, L, G in [(40, 3, 30), (31, 3, 30), (30, 3, 30), (8, 3, 8)]:
        loc, glob, eff_g = window_indices(T, L, G)
        idx = jnp.arange(T)
        np.testing.assert_array_equal(
            np.asarray(banded.band_starts(idx, L, T)), loc[:, 0])
        np.testing.assert_array_equal(
            np.asarray(banded.band_starts(idx, eff_g, T)), glob[:, 0])


def test_padding_rows_never_leak():
    """Valid rows of a padded chunk equal the unpadded pass exactly."""
    cfg = tsf.vit_tiny_config(img_size=32, drop_path_rate=0.0)
    params = _params(cfg)
    T, C_pad, eff = 10, 16, 3
    frames = _frames(T, cfg.img_size)
    padded = np.concatenate(
        [frames, np.repeat(frames[-1:], C_pad - T, axis=0)], axis=0)
    a = np.asarray(banded.banded_cls_features(
        params, jnp.asarray(frames[:T]), T, cfg, eff=eff, block=2))
    b = np.asarray(banded.banded_cls_features(
        params, jnp.asarray(padded), T, cfg, eff=eff, block=4))
    np.testing.assert_allclose(a[:T], b[:T], atol=3e-5, rtol=1e-4)


def test_interior_band_is_local():
    """With band eff=3 and depth d, frame i's CLS depends only on frames
    within +-(d * (eff//2) + eff//2) — perturbing a frame far outside the
    receptive field leaves the CLS bit-identical."""
    cfg = tsf.TimeSformerConfig(embed_dim=192, depth=2, num_heads=3,
                                img_size=32, drop_path_rate=0.0)
    params = _params(cfg)
    T, eff = 24, 3
    frames = _frames(T, cfg.img_size)
    base = np.asarray(banded.banded_cls_features(
        params, jnp.asarray(frames), T, cfg, eff=eff, block=4))
    pert = frames.copy()
    pert[-1] += 10.0  # far from frame 0: receptive field is +-3
    got = np.asarray(banded.banded_cls_features(
        params, jnp.asarray(pert), T, cfg, eff=eff, block=4))
    np.testing.assert_array_equal(base[0], got[0])
    assert not np.allclose(base[-1], got[-1])
