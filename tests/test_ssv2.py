"""SSv2 frame-list dataset tests.

The reference ships Ssv2 as dead code (broken `timesformer.utils.logging`
import, commented out of datasets_custom/__init__.py); these tests pin our
working rebuild to the reference's label/frame-list format and sampling
math (ref: datasets_custom/ssv2.py:21-278)."""

import json
import os

import numpy as np
import pytest

import conftest  # noqa: F401

from dino_video_summarization_transformer_tpu.config import get_cfg
from dino_video_summarization_transformer_tpu.data import (
    Ssv2Dataset, build_dataset)
from dino_video_summarization_transformer_tpu.data.datasets import (
    load_image_lists, retry_load_images)


@pytest.fixture(scope="module")
def ssv2_dir(tmp_path_factory):
    """Tiny SSv2 layout: 3 videos x 12 frames of PNGs + label/split JSONs +
    frame-list CSVs."""
    from PIL import Image

    root = tmp_path_factory.mktemp("ssv2")
    labels = {"Doing thing A": "0", "Doing thing B": "1"}
    (root / "something-something-v2-labels.json").write_text(
        json.dumps(labels))
    vids = [("101", "Doing [thing] A"), ("102", "Doing [thing] B"),
            ("103", "Doing [thing] A")]
    for split in ("train", "validation"):
        (root / f"something-something-v2-{split}.json").write_text(
            json.dumps([{"id": v, "template": t} for v, t in vids]))

    rng = np.random.RandomState(0)
    frames_dir = root / "frames"
    frames_dir.mkdir()
    for vid, _ in vids:
        for fi in range(12):
            arr = rng.randint(0, 256, (64, 80, 3), dtype=np.uint8)
            Image.fromarray(arr).save(frames_dir / f"{vid}_{fi:03d}.png")

    for csv_name in ("train.csv", "val.csv"):
        rows = ["original_vido_id video_id frame_id path labels"]
        for i, (vid, _) in enumerate(vids):
            for fi in range(12):
                rows.append(
                    f"{vid} {i} {fi} frames/{vid}_{fi:03d}.png \"\"")
        (root / csv_name).write_text("\n".join(rows) + "\n")
    return str(root)


def _cfg(root):
    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = root
    cfg.DATA.PATH_PREFIX = root
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [40, 48]
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 2
    cfg.TEST.NUM_SPATIAL_CROPS = 3
    return cfg


def test_load_image_lists(ssv2_dir):
    paths, labels = load_image_lists(
        os.path.join(ssv2_dir, "train.csv"), ssv2_dir)
    assert set(paths) == {"101", "102", "103"}
    assert len(paths["101"]) == 12
    assert paths["101"][0].endswith("frames/101_000.png")
    assert labels["101"][0] == []


def test_retry_load_images_bgr(ssv2_dir):
    """Loader returns the reference's cv2.imread BGR channel order."""
    from PIL import Image

    p = os.path.join(ssv2_dir, "frames", "101_000.png")
    rgb = np.asarray(Image.open(p).convert("RGB"))
    out = retry_load_images([p, p])
    assert out.shape == (2, 64, 80, 3)
    np.testing.assert_array_equal(out[0], rgb[..., ::-1])


def test_ssv2_train_item(ssv2_dir):
    ds = Ssv2Dataset(_cfg(ssv2_dir), "train", seed=0)
    assert len(ds) == 3
    frames, label, index, meta = ds[0]
    assert frames.shape == (3, 4, 32, 32)
    assert frames.dtype == np.float32
    assert label in (0, 1)
    assert meta == {}


def test_ssv2_test_grid_and_determinism(ssv2_dir):
    cfg = _cfg(ssv2_dir)
    ds = build_dataset("ssv2", cfg, "test", seed=0)
    # 3 videos x 2 ensemble views x 3 spatial crops
    assert len(ds) == 18
    f1, l1, _, _ = ds[4]
    f2, l2, _, _ = ds[4]
    np.testing.assert_array_equal(f1, f2)  # val/test sampling deterministic
    assert f1.shape == (3, 4, 32, 32)


def test_ssv2_seq_indices_match_reference_math(ssv2_dir):
    """Midpoint sampling == the reference's loop (ref: ssv2.py:225-236)."""
    ds = Ssv2Dataset(_cfg(ssv2_dir), "val", seed=0)
    for video_length in (4, 7, 12, 31):
        seg_size = float(video_length - 1) / 4
        expected = []
        for i in range(4):
            start = int(np.round(seg_size * i))
            end = int(np.round(seg_size * (i + 1)))
            expected.append((start + end) // 2)
        assert ds.seq_indices(video_length) == expected

    # train draws inside each segment (inclusive bounds, like
    # random.randint in the reference)
    ds_train = Ssv2Dataset(_cfg(ssv2_dir), "train", seed=1)
    for _ in range(20):
        seq = ds_train.seq_indices(12)
        seg_size = 11.0 / 4
        for i, s in enumerate(seq):
            lo = int(np.round(seg_size * i))
            hi = int(np.round(seg_size * (i + 1)))
            assert lo <= s <= hi
