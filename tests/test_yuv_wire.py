"""YUV 4:2:0 wire-format tests: pack/unpack math, native decoder output,
dataset plumbing, and score equivalence vs the RGB wire.

The yuv420 wire ships the codec's own subsampled planar layout (1.5 B/px vs
RGB24's 3) and color-converts on device inside the scoring kernels
(data/yuv.py). The reference always converts to RGB on the host
(ref: datasets_custom/decoder.py:65-106); these tests bound the numeric
delta of deferring that conversion.
"""

import numpy as np
import pytest

from dino_video_summarization_transformer_tpu.data import video as vio
from dino_video_summarization_transformer_tpu.data import yuv
from dino_video_summarization_transformer_tpu.data.windows import (
    window_indices)


def _smooth_rgb(T=6, H=64, W=96, seed=0):
    """Natural-ish frames: smoothed noise (chroma varies slowly, like video)."""
    r = np.random.RandomState(seed)
    f = r.rand(T, H, W, 3).astype(np.float32)
    for _ in range(4):
        f = 0.25 * (np.roll(f, 1, 1) + np.roll(f, -1, 1)
                    + np.roll(f, 1, 2) + np.roll(f, -1, 2))
    lo, hi = f.min(), f.max()
    return (255 * (f - lo) / (hi - lo)).astype(np.uint8)


def test_pack_unpack_roundtrip_chroma_constant():
    # frames whose chroma is constant over each 2x2 block: subsampling is
    # lossless, so the roundtrip should be exact up to integer rounding
    r = np.random.RandomState(0)
    base = r.rand(3, 24, 32, 3)
    frames = np.clip(np.kron(base, np.ones((1, 2, 2, 1))) * 255,
                     0, 255).astype(np.uint8)
    back = yuv.unpack_to_rgb(yuv.pack_rgb(frames))
    err = np.abs(back.astype(int) - frames.astype(int))
    assert err.max() <= 3, err.max()


def test_pack_unpack_roundtrip_videolike():
    # video-like content: luma texture + slowly varying color tint. (Real
    # codec output has no per-pixel chroma by construction — 4:2:0 — so
    # independent-RGB-noise fixtures overstate subsampling loss; the
    # decoder-path test below bounds the real-pipeline delta.)
    r = np.random.RandomState(1)
    T, H, W = 4, 64, 96
    luma = r.rand(T, H, W, 1).astype(np.float32)
    for _ in range(2):
        luma = 0.25 * (np.roll(luma, 1, 1) + np.roll(luma, -1, 1)
                       + np.roll(luma, 1, 2) + np.roll(luma, -1, 2))
    tint = np.kron(r.rand(T, H // 16, W // 16, 3).astype(np.float32),
                   np.ones((1, 16, 16, 1)))
    frames = np.clip(255 * (0.25 + 0.5 * luma) * (0.6 + 0.4 * tint),
                     0, 255).astype(np.uint8)
    back = yuv.unpack_to_rgb(yuv.pack_rgb(frames))
    err = np.abs(back.astype(np.float32) - frames.astype(np.float32))
    assert err.mean() < 3.0, err.mean()
    assert np.percentile(err, 99) < 16, np.percentile(err, 99)


def test_device_unpack_matches_host_mirror():
    import jax.numpy as jnp

    packed = yuv.pack_rgb(_smooth_rgb(T=2))
    mean, std = [0.45] * 3, [0.225] * 3
    dev = np.asarray(yuv.unpack_normalize(jnp.asarray(packed), mean, std,
                                          jnp.float32))
    host = ((yuv.unpack_to_rgb(packed).astype(np.float32) / 255.0)
            - 0.45) / 0.225
    # host mirror rounds to uint8; device keeps continuous values
    assert np.abs(dev - host).max() < (1.0 / 255.0) / 0.225 + 1e-5


def test_crop_matches_rgb_crop():
    packed = yuv.pack_rgb(_smooth_rgb())
    c = yuv.crop(packed, 7, 13, 32, 48)  # odd offsets round down to even
    assert c.shape[-2:] == (48, 48)
    np.testing.assert_array_equal(
        yuv.unpack_to_rgb(c), yuv.unpack_to_rgb(packed)[:, 6:38, 12:60])


def test_native_decoder_yuv_matches_rgb_path(tmp_path):
    # both paths decode the same codec YUV; they differ only in where the
    # color conversion runs (swscale-on-host vs our matrix on device)
    frames = _smooth_rgb(T=8, H=64, W=96, seed=3)
    path = str(tmp_path / "v.avi")
    vio.write_video(path, frames, fps=30.0)

    rgb, fps_a = vio.read_video(path)
    packed, fps_b = vio.read_video_yuv420(path)
    assert fps_a == fps_b
    assert packed.shape == (rgb.shape[0], rgb.shape[1] * 3 // 2, rgb.shape[2])
    ours = yuv.unpack_to_rgb(packed).astype(np.float32)
    err = np.abs(ours - rgb.astype(np.float32))
    # chroma upsample filter (bilinear vs nearest) + integer rounding
    assert err.mean() < 2.5, err.mean()
    assert np.percentile(err, 99) < 12, np.percentile(err, 99)


def test_decoder_yuv_strided(tmp_path):
    frames = _smooth_rgb(T=12, H=32, W=32, seed=5)
    path = str(tmp_path / "v.avi")
    vio.write_video(path, frames, fps=30.0)
    full, _ = vio.read_video_yuv420(path)
    strided, _ = vio.read_video_yuv420(path, stride=3)
    np.testing.assert_array_equal(strided, full[::3])


@pytest.fixture(scope="module")
def tiny_scorer():
    import jax

    from dino_video_summarization_transformer_tpu.engine.scoring import (
        FrameScorer)
    from dino_video_summarization_transformer_tpu.models import (
        init_timesformer, vit_tiny_config)

    cfg = vit_tiny_config(num_frames=8, num_classes=0, img_size=32)
    params = init_timesformer(jax.random.key(0), cfg)
    return FrameScorer(params, cfg, chunk=8, precision=None,
                       compute_dtype=np.float32)


def test_scores_match_rgb_wire(tiny_scorer):
    from dino_video_summarization_transformer_tpu.utils.synthetic import (
        make_video)

    T = 64
    vid_f32 = make_video(1, T, 32)  # float in [0,1], smooth + events
    raw = np.clip(vid_f32 * 255, 0, 255).astype(np.uint8)
    # the wires are compared on the SAME underlying 4:2:0 content (what a
    # codec emits): rgb wire gets the host-converted frames, yuv wire the
    # packed planes — mirroring read_video vs read_video_yuv420 on one file
    packed = yuv.pack_rgb(raw)
    vid_u8 = yuv.unpack_to_rgb(packed)
    loc, glob, eff = window_indices(T, 3, 30)

    rgb_scores = tiny_scorer.score_video(vid_u8, loc, glob, eff)
    yuv_scores = tiny_scorer.score_video(packed, loc, glob, eff)

    rel = np.abs(yuv_scores - rgb_scores) / (np.abs(rgb_scores).mean() + 1e-9)
    assert rel.max() < 0.05, rel.max()
    ra = np.argsort(np.argsort(rgb_scores)).astype(float)
    rb = np.argsort(np.argsort(yuv_scores)).astype(float)
    ra -= ra.mean()
    rb -= rb.mean()
    spearman = (ra * rb).sum() / np.sqrt((ra * ra).sum() * (rb * rb).sum())
    assert spearman > 0.99, spearman


def test_dataset_yuv_wire(tmp_path):
    """DinoLossDataset(wire_format='yuv420') returns packed frames whose
    unpack matches the rgb dataset's crop geometry."""
    from dino_video_summarization_transformer_tpu.config.defaults import (
        get_cfg)
    from dino_video_summarization_transformer_tpu.data.datasets import (
        DinoLossDataset)

    frames = _smooth_rgb(T=40, H=240, W=320, seed=7)
    vdir = tmp_path / "vids"
    vdir.mkdir()
    vio.write_video(str(vdir / "a.avi"), frames, fps=30.0)
    (tmp_path / "test.csv").write_text("a.avi 0\n")

    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(tmp_path)
    cfg.DATA.PATH_PREFIX = str(vdir)
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1

    ds_rgb = DinoLossDataset(cfg, "test", 3, 30, 1, device_preprocess=True)
    ds_yuv = DinoLossDataset(cfg, "test", 3, 30, 1, wire_format="yuv420")
    a = ds_rgb[0]
    b = ds_yuv[0]
    assert not a["dummy"] and not b["dummy"]
    assert b["frames"].shape == (a["frames"].shape[0], 336, 224)
    np.testing.assert_array_equal(a["local_idx"], b["local_idx"])
    rgb_from_yuv = yuv.unpack_to_rgb(b["frames"]).astype(np.float32)
    err = np.abs(rgb_from_yuv - a["frames"].astype(np.float32))
    # same decode, same (even-aligned) crop window, different color path;
    # the rgb crop offset may sit one luma row/col off the even-aligned one
    assert err.mean() < 6.0, err.mean()


def test_odd_quarter_height_layout(tmp_path):
    """H == 2 (mod 4) frames (e.g. 480x270 video): the packed layout is
    byte-flat after the Y rows, so pack/crop/unpack must work even though
    the U plane ends mid-row (ADVICE r2 high: the old whole-row layout
    raised ValueError and crashed yuv420 scoring runs for such videos)."""
    # chroma constant over each 2x2 block -> subsampling is lossless and
    # the roundtrip isolates the LAYOUT (any byte misplacement explodes)
    r = np.random.RandomState(3)
    base = r.rand(4, 135, 160, 3)
    frames = np.clip(np.kron(base, np.ones((1, 2, 2, 1))) * 255,
                     0, 255).astype(np.uint8)
    p = yuv.pack_rgb(frames)
    assert p.shape == (4, 405, 320)
    back = yuv.unpack_to_rgb(p)
    err = np.abs(back.astype(int) - frames.astype(int))
    assert err.max() <= 3, err.max()

    # crop stays consistent with crop-of-unpacked at even-aligned offsets
    c = yuv.crop(p, 23, 48, 224, 224)
    ref = yuv.unpack_to_rgb(p)[:, 22:22 + 224, 48:48 + 224]
    np.testing.assert_array_equal(yuv.unpack_to_rgb(c), ref)

    # device unpack agrees with the host mirror (pre-rounding)
    import jax.numpy as jnp

    out = np.asarray(yuv.unpack_normalize(
        jnp.asarray(c), [0.45] * 3, [0.225] * 3, jnp.float32))
    host = (ref.astype(np.float32) / 255.0 - 0.45) / 0.225
    assert np.abs(out - host).max() < 0.01  # half a uint8 step / 0.225


def test_dataset_odd_height_video_no_crash(tmp_path):
    """A real 480x270-style video must score, not crash: the native decoder
    emits even-rounded H=270 packed frames, and DinoLossDataset must carry
    them through crop/windows (or degrade to the dummy protocol — never
    raise)."""
    if not vio.native_available():
        pytest.skip("native decoder unavailable")
    from dino_video_summarization_transformer_tpu.config.defaults import (
        get_cfg)
    from dino_video_summarization_transformer_tpu.data.datasets import (
        DinoLossDataset)

    frames = _smooth_rgb(T=40, H=270, W=480, seed=9)
    vdir = tmp_path / "vids"
    vdir.mkdir()
    vio.write_video(str(vdir / "odd.avi"), frames, fps=30.0)
    (tmp_path / "test.csv").write_text("odd.avi 0\n")

    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(tmp_path)
    cfg.DATA.PATH_PREFIX = str(vdir)
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1

    ds = DinoLossDataset(cfg, "test", 3, 30, 1, wire_format="yuv420")
    item = ds[0]
    assert not item["dummy"], "odd-height video should score, not dummy"
    assert item["frames"].shape[1:] == (336, 224)


def test_dataset_unexpected_error_degrades_to_dummy(tmp_path, monkeypatch):
    """Unexpected per-video exceptions (not just DecodeError) must route to
    the constant-loss dummy protocol instead of crashing the scoring run."""
    from dino_video_summarization_transformer_tpu.config.defaults import (
        get_cfg)
    from dino_video_summarization_transformer_tpu.data import datasets as dmod

    (tmp_path / "test.csv").write_text("ghost.avi 0\n")
    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(tmp_path)
    cfg.DATA.PATH_PREFIX = str(tmp_path)
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1

    ds = dmod.DinoLossDataset(cfg, "test", 3, 30, 1, wire_format="yuv420")

    def boom(*a, **k):
        raise ValueError("corrupt geometry")

    monkeypatch.setattr(dmod.vio, "read_video_yuv420", boom)
    item = ds[0]
    assert item["dummy"] and item["frames"] is None


def test_q_pack_unpack_roundtrip():
    """yuv420q round trip: constant-chroma content survives exactly; Y is
    bit-identical to the I420 pack (only chroma is further averaged)."""
    rgb = np.full((2, 32, 64, 3), 0, np.uint8)
    rgb[..., 0] = 120
    rgb[..., 1] = 64
    rgb[..., 2] = 200
    packed = yuv.pack_rgb_q(rgb)
    assert packed.shape == (2, yuv.packed_q_height(32, 64), 64)
    back = yuv.unpack_q_to_rgb(packed)
    assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 3
    i420 = yuv.pack_rgb(rgb)
    np.testing.assert_array_equal(packed[:, :32], i420[:, :32])  # Y rows


def test_q_frame_height_inverse():
    for h in (32, 96, 224, 256):
        for w in (32, 224, 320):
            assert yuv.frame_height_q(yuv.packed_q_height(h, w), w) == h


def test_q_device_unpack_matches_host_mirror():
    import jax.numpy as jnp

    packed = yuv.pack_rgb_q(_smooth_rgb(T=2))
    mean, std = np.array([0.45] * 3), np.array([0.225] * 3)
    dev = np.asarray(yuv.unpack_normalize_q(jnp.asarray(packed), mean, std,
                                            jnp.float32))
    host = ((yuv.unpack_q_to_rgb(packed).astype(np.float32) / 255.0)
            - mean) / std
    np.testing.assert_allclose(dev, host, atol=0.02)


def test_q_crop_matches_full_crop():
    rgb = _smooth_rgb(T=3, H=64, W=96)
    a = yuv.unpack_q_to_rgb(yuv.crop_q(yuv.pack_rgb_q(rgb), 8, 16, 32, 48))
    b = yuv.unpack_q_to_rgb(yuv.pack_rgb_q(rgb[:, 8:40, 16:64]))
    # same 8-aligned crop window -> identical chroma blocks
    np.testing.assert_array_equal(a, b)


def test_scores_q_wire_delta_quantified(tiny_scorer):
    """yuv420q is an INVALIDATED wire experiment, kept as a knob.

    Measured on the synthetic validators (de-saturated teacher, img 32/96):
    chroma at 1/8 per axis costs 16-27% rel score error (Spearman 0.08-0.89)
    and even 1/4 per axis costs ~7% vs the ~2.7% bf16 floor — chroma
    carries real DINO-feature signal, so sub-4:2:0 chroma is NOT a valid
    approximation (same verdict pattern as the low-res teacher; BENCH.md
    "The wire"). This test pins the mechanism (scorer consumes the q
    layout, scores finite, rank signal not degenerate) and documents the
    envelope so a future revalidation with trained checkpoints has a
    baseline."""
    import dataclasses

    from dino_video_summarization_transformer_tpu.data.windows import (
        window_indices)
    from dino_video_summarization_transformer_tpu.engine.scoring import (
        FrameScorer)
    from dino_video_summarization_transformer_tpu.utils.synthetic import (
        make_video)

    T = 64
    raw = np.clip(make_video(1, T, 32) * 255, 0, 255).astype(np.uint8)
    packed = yuv.pack_rgb(raw)
    loc, glob, eff = window_indices(T, 3, 30)

    base = tiny_scorer.score_video(packed, loc, glob, eff)
    q_scorer = FrameScorer(tiny_scorer.params, tiny_scorer.model_cfg,
                           dataclasses.replace(tiny_scorer.config,
                                               wire_format="yuv420q"))
    q = q_scorer.score_video(yuv.quarter_chroma(packed), loc, glob, eff)

    assert np.isfinite(q).all()
    assert q.shape == base.shape
    # not degenerate: scores still vary across frames
    assert np.std(q) > 0


def test_dataset_q_wire(tmp_path):
    """DinoLossDataset(wire_format='yuv420q') ships q-packed frames whose
    unpack matches the yuv420 dataset's crop, chroma-averaged."""
    from dino_video_summarization_transformer_tpu.config.defaults import (
        get_cfg)
    from dino_video_summarization_transformer_tpu.data import video as vio
    from dino_video_summarization_transformer_tpu.data.datasets import (
        DinoLossDataset)

    if not vio.native_available():
        pytest.skip("native decoder not built")
    rng = np.random.RandomState(0)
    fr = rng.randint(0, 256, (12, 256, 320, 3), dtype=np.uint8)
    vio.write_video(str(tmp_path / "a.avi"), fr, fps=30)
    (tmp_path / "test.csv").write_text("a.avi 0\n")
    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(tmp_path)
    cfg.DATA.PATH_PREFIX = str(tmp_path)
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1

    it_i420 = DinoLossDataset(cfg, "test", 3, 30, 1,
                              wire_format="yuv420")[0]
    it_q = DinoLossDataset(cfg, "test", 3, 30, 1,
                           wire_format="yuv420q")[0]
    assert not it_q["dummy"]
    assert it_q["frames"].shape == (12, yuv.packed_q_height(224, 224), 224)
    np.testing.assert_array_equal(
        it_q["frames"], yuv.quarter_chroma(it_i420["frames"]))
