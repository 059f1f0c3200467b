"""Aux tooling tests: image ops, multigrid, logging, tools scripts."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import conftest

import jax
import jax.numpy as jnp

from dino_video_summarization_transformer_tpu.data.multigrid import (
    ShortCycleBatcher, get_random_sampling_rate)
from dino_video_summarization_transformer_tpu.ops.image import rand_conv, sobel
from dino_video_summarization_transformer_tpu.utils.logging import log_json_stats


def test_rand_conv_blend_and_shapes():
    rng = jax.random.key(0)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 3, 4, 16, 16), jnp.float32)
    out = rand_conv(rng, x, alpha=0.7)
    assert out.shape == x.shape
    # alpha=1 -> identity
    out1 = rand_conv(rng, x, alpha=1.0)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(x), atol=1e-6)


def test_sobel_detects_edges():
    img = np.zeros((1, 1, 16, 16), np.float32)
    img[:, :, :, 8:] = 1.0  # vertical edge
    mag = np.asarray(sobel(jnp.asarray(img)))
    assert mag.shape == img.shape
    assert mag[0, 0, 8, 8] > 0.3  # strong response at the edge
    assert mag[0, 0, 8, 2] < 1e-2  # flat region


def test_short_cycle_batcher():
    class Cfg:
        class DATA:
            TRAIN_CROP_SIZE = 224

        class MULTIGRID:
            SHORT_CYCLE_FACTORS = [0.5, 0.5 ** 0.5]
            DEFAULT_S = 224

    b = ShortCycleBatcher(range(40), batch_size=2, drop_last=False, cfg=Cfg)
    batches = list(b)
    # factors: (224/112)^2 = 4x, (224/158.4)^2 = 2x -> sizes [8, 4, 2]
    assert [len(x) for x in batches[:3]] == [8, 4, 2]
    assert batches[0][0][1] == 0 and batches[1][0][1] == 1
    assert sum(len(x) for x in batches) == 40
    # __len__ is the reference's avg-batch estimate (ceil(n/avg)), which can
    # overshoot the true batch count by one (ref: multigrid_helper.py:72-78)
    assert len(b) == int(np.ceil(40 / (np.mean([8, 4, 2]))))


def test_get_random_sampling_rate():
    rng = np.random.RandomState(0)
    assert get_random_sampling_rate(0, 4) == 4
    for _ in range(10):
        r = get_random_sampling_rate(8, 4, rng)
        assert 4 <= r <= 8


def test_log_json_stats(capsys):
    import logging

    logger = logging.getLogger("test_json")
    logger.addHandler(logging.StreamHandler(sys.stdout))
    logger.setLevel(logging.INFO)
    log_json_stats({"loss": 1.2345678, "epoch": 3}, logger)
    out = capsys.readouterr().out
    assert "json_stats:" in out
    assert '"loss": 1.23457' in out


@pytest.mark.slow
def test_tools_end_to_end(tmp_path):
    """merge_json + extract_video_adaptive + visualization on synth data."""
    from dino_video_summarization_transformer_tpu.data import video as vio

    if not vio.native_available():
        pytest.skip("native decoder not built")

    # merge_json
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text(json.dumps({"v1": [1, 2]}))
    b.write_text(json.dumps({"v2": [3]}))
    merged_path = tmp_path / "m.json"
    sys.path.insert(0, conftest.REPO_ROOT)
    from tools.merge_json import merge_json_files

    merged = merge_json_files([str(a), str(b)], str(merged_path))
    assert merged == {"v1": [1, 2], "v2": [3]}

    # extract_video_adaptive on a synthetic clip
    rng = np.random.RandomState(0)
    fr = rng.randint(0, 256, (64, 128, 160, 3), dtype=np.uint8)
    vid = tmp_path / "clipX.avi"
    vio.write_video(str(vid), fr, fps=30)
    losses = {"clipX": list(rng.rand(16))}
    lf = tmp_path / "loss.json"
    lf.write_text(json.dumps(losses))

    from tools.extract_video_adaptive import extract

    a_idx, u_idx = extract(str(vid), str(lf), num_frames=8,
                           pre_sampling_rate=4, out_dir=str(tmp_path / "out"))
    assert len(a_idx) == 8 and len(u_idx) == 8
    assert (tmp_path / "out" / "clipX_a.mp4").exists()
    assert (tmp_path / "out" / "clipX_u.mp4").exists()
    assert (tmp_path / "out" / "clipX_loss.png").exists()


def test_image_dino_aug_shapes():
    import random

    from PIL import Image

    from dino_video_summarization_transformer_tpu.data.image_aug import (
        DataAugmentationDINO)

    rng = random.Random(0)
    img = Image.fromarray(
        np.random.RandomState(0).randint(0, 256, (128, 160, 3), dtype=np.uint8))
    aug = DataAugmentationDINO(local_crops_number=4, rng=rng)
    crops = aug(img)
    assert len(crops) == 6
    assert crops[0].shape == (3, 224, 224)
    assert crops[2].shape == (3, 96, 96)
    assert all(np.isfinite(c).all() for c in crops)


def test_cv2_transform_list_ops():
    from dino_video_summarization_transformer_tpu.data import cv2_transform as c2

    rng = np.random.RandomState(0)
    frames = [rng.rand(40, 60, 3).astype(np.float32) for _ in range(3)]
    scaled, _ = c2.random_short_side_scale_jitter_list(frames, 32, 32, rng=rng)
    assert scaled[0].shape[0] == 32
    cropped, _ = c2.spatial_shift_crop_list(24, scaled, 1)
    assert cropped[0].shape[:2] == (24, 24)
    chw = [np.moveaxis(f, -1, 0) for f in cropped]
    flipped, _ = c2.horizontal_flip_list(1.0, chw, order="CHW", rng=rng)
    np.testing.assert_allclose(flipped[0][:, :, ::-1], chw[0], atol=1e-6)
    norm = c2.color_normalization(chw[0], [0.45] * 3, [0.225] * 3)
    assert norm.shape == chw[0].shape


def test_swin_2d_inflation():
    import jax.numpy as jnp

    from dino_video_summarization_transformer_tpu.models import swin3d

    cfg = swin3d.Swin3DConfig(patch_size=(2, 4, 4), window_size=(2, 3, 3),
                              depths=(1,), num_heads=(2,), embed_dim=8)
    # synthetic 2D state dict fragment
    sd2d = {
        "patch_embed.proj.weight": np.random.RandomState(0).randn(8, 3, 4, 4),
        "layers.0.blocks.0.attn.relative_position_bias_table":
            np.random.RandomState(1).randn(25, 2),  # (2*3-1)^2 for 2D w=3
        "layers.0.blocks.0.attn.relative_position_index": np.zeros((9, 9)),
    }
    out = swin3d.inflate_2d_state_dict(sd2d, cfg)
    assert out["patch_embed.proj.weight"].shape == (8, 3, 2, 4, 4)
    np.testing.assert_allclose(
        out["patch_embed.proj.weight"][:, :, 0] * 2,
        sd2d["patch_embed.proj.weight"], atol=1e-6)
    # bias table tiled over 2*Wd-1 = 3 temporal offsets
    assert out["layers.0.blocks.0.attn.relative_position_bias_table"].shape == (75, 2)
    assert "layers.0.blocks.0.attn.relative_position_index" not in out


def test_all_config_variants_load():
    import glob

    from dino_video_summarization_transformer_tpu.config import get_cfg

    paths = glob.glob(os.path.join(conftest.REPO_ROOT, "configs/**/*.yaml"),
                      recursive=True)
    assert len(paths) >= 7
    for p in paths:
        cfg = get_cfg()
        cfg.merge_from_file(p)
        assert cfg.DATA.NUM_FRAMES >= 1
        assert cfg.TIMESFORMER.ATTENTION_TYPE in (
            "divided_space_time", "joint_space_time", "space_only")
