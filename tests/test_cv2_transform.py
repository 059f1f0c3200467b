"""Oracle parity tests for the cv2/ndarray transform surface.

Every op in data/cv2_transform.py is run against the reference
datasets_custom/cv2_transform.py (imported read-only) with a shared
np.random seed; random ops must be bit-identical draw-for-draw.
"""

import numpy as np
import pytest

import conftest

conftest.add_reference_path()

from datasets_custom import cv2_transform as ref  # noqa: E402

from dino_video_summarization_transformer_tpu.data import (  # noqa: E402
    cv2_transform as ours)


def _hwc_frames(n=3, h=48, w=64, seed=0):
    r = np.random.RandomState(seed)
    return [r.rand(h, w, 3).astype(np.float32) for _ in range(n)]


def _chw_frames(n=3, h=48, w=64, seed=0):
    return [np.moveaxis(f, -1, 0).copy() for f in _hwc_frames(n, h, w, seed)]


def _boxes(seed=1, n=4, h=48, w=64):
    r = np.random.RandomState(seed)
    x1 = r.uniform(0, w / 2, n)
    y1 = r.uniform(0, h / 2, n)
    return np.stack([x1, y1, x1 + r.uniform(1, w / 2, n),
                     y1 + r.uniform(1, h / 2, n)], axis=1).astype(np.float32)


def _assert_same(a, b):
    if isinstance(a, (list, tuple)):
        assert type(a) in (list, tuple) and len(a) == len(b)
        for x, y in zip(a, b):
            _assert_same(x, y)
    elif a is None:
        assert b is None
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_box_ops_match_reference():
    _assert_same(ref.clip_boxes_to_image(_boxes(), 20, 30),
                 ours.clip_boxes_to_image(_boxes(), 20, 30))
    _assert_same(ref.scale_boxes(32, _boxes(), 48, 64),
                 ours.scale_boxes(32, _boxes(), 48, 64))
    _assert_same(ref.flip_boxes(_boxes(), 64), ours.flip_boxes(_boxes(), 64))
    _assert_same(ref.crop_boxes(_boxes(), 5, 7), ours.crop_boxes(_boxes(), 5, 7))
    _assert_same(ref.revert_scaled_boxes(24, _boxes(), 48, 64),
                 ours.revert_scaled_boxes(24, _boxes(), 48, 64))


def test_scale_and_center_crop_match_reference():
    img = _hwc_frames(1)[0]
    _assert_same(ref.scale(32, img), ours.scale(32, img))
    _assert_same(ref.scale(48, img), ours.scale(48, img))  # no-op branch
    _assert_same(ref.center_crop(24, img), ours.center_crop(24, img))
    chw = _chw_frames(1)[0]
    _assert_same(ref.pad_image(chw, 3), ours.pad_image(chw, 3))
    _assert_same(ref.pad_image(img, 3, order="HWC"),
                 ours.pad_image(img, 3, order="HWC"))
    _assert_same(ref.CHW2HWC(chw), ours.CHW2HWC(chw))
    _assert_same(ref.HWC2CHW(img), ours.HWC2CHW(img))


def test_scale_jitter_ops_match_reference():
    np.random.seed(7)
    a = ref.random_short_side_scale_jitter_list(
        _hwc_frames(), 28, 40, boxes=[_boxes(i) for i in range(3)])
    np.random.seed(7)
    b = ours.random_short_side_scale_jitter_list(
        _hwc_frames(), 28, 40, boxes=[_boxes(i) for i in range(3)])
    _assert_same(a, b)

    np.random.seed(3)
    a = ref.random_scale_jitter(_hwc_frames(1)[0], 28, 40)
    np.random.seed(3)
    b = ours.random_scale_jitter(_hwc_frames(1)[0], 28, 40)
    _assert_same(a, b)

    np.random.seed(3)
    a = ref.random_scale_jitter_list(_hwc_frames(), 28, 40)
    np.random.seed(3)
    b = ours.random_scale_jitter_list(_hwc_frames(), 28, 40)
    _assert_same(a, b)


@pytest.mark.parametrize("order", ["CHW", "HWC"])
def test_random_crop_list_matches_reference(order):
    frames = _chw_frames if order == "CHW" else _hwc_frames
    np.random.seed(11)
    a = ref.random_crop_list(frames(), 24, pad_size=2, order=order,
                             boxes=[_boxes(i) for i in range(3)])
    np.random.seed(11)
    b = ours.random_crop_list(frames(), 24, pad_size=2, order=order,
                              boxes=[_boxes(i) for i in range(3)])
    _assert_same(a, b)


@pytest.mark.parametrize("pos", [0, 1, 2])
def test_spatial_shift_crop_list_matches_reference(pos):
    a = ref.spatial_shift_crop_list(24, _hwc_frames(), pos,
                                    boxes=[_boxes(i) for i in range(3)])
    b = ours.spatial_shift_crop_list(24, _hwc_frames(), pos,
                                     boxes=[_boxes(i) for i in range(3)])
    _assert_same(a, b)


@pytest.mark.parametrize("order", ["CHW", "HWC"])
def test_horizontal_flip_list_matches_reference(order):
    frames = _chw_frames if order == "CHW" else _hwc_frames
    np.random.seed(5)
    a = ref.horizontal_flip_list(1.0, frames(), order=order,
                                 boxes=[_boxes(i) for i in range(3)])
    np.random.seed(5)
    b = ours.horizontal_flip_list(1.0, frames(), order=order,
                                  boxes=[_boxes(i) for i in range(3)])
    _assert_same(a, b)


def test_random_sized_crop_matches_reference():
    for seed in (0, 1, 2, 42):
        np.random.seed(seed)
        a = ref.random_sized_crop(_hwc_frames(1)[0], 24)
        np.random.seed(seed)
        b = ours.random_sized_crop(_hwc_frames(1)[0], 24)
        _assert_same(a, b)
    np.random.seed(0)
    a = ref.random_sized_crop_list(_hwc_frames(), 24)
    np.random.seed(0)
    b = ours.random_sized_crop_list(_hwc_frames(), 24)
    _assert_same(a, b)


def test_color_ops_match_reference():
    img = _chw_frames(1)[0]
    _assert_same(ref.grayscale(img), ours.grayscale(img))
    _assert_same(ref.blend(img, img * 0.5, 0.3), ours.blend(img, img * 0.5, 0.3))
    _assert_same(ref.color_normalization(img.copy(), [0.4, 0.5, 0.6],
                                         [0.2, 0.25, 0.3]),
                 ours.color_normalization(img.copy(), [0.4, 0.5, 0.6],
                                          [0.2, 0.25, 0.3]))
    for fn in ("brightness", "contrast", "saturation"):
        np.random.seed(9)
        a = getattr(ref, fn)(0.4, _chw_frames(1)[0])
        np.random.seed(9)
        b = getattr(ours, fn)(0.4, _chw_frames(1)[0])
        _assert_same(a, b)
        np.random.seed(9)
        a = getattr(ref, fn + "_list")(0.4, _chw_frames())
        np.random.seed(9)
        b = getattr(ours, fn + "_list")(0.4, _chw_frames())
        _assert_same(a, b)


def test_color_jitter_matches_reference():
    np.random.seed(13)
    a = ref.color_jitter(_chw_frames(1)[0], 0.3, 0.3, 0.3)
    np.random.seed(13)
    b = ours.color_jitter(_chw_frames(1)[0], 0.3, 0.3, 0.3)
    _assert_same(a, b)
    np.random.seed(13)
    a = ref.color_jitter_list(_chw_frames(), 0.3, 0.3, 0.3)
    np.random.seed(13)
    b = ours.color_jitter_list(_chw_frames(), 0.3, 0.3, 0.3)
    _assert_same(a, b)


def test_lighting_matches_reference():
    eigval = [0.2175, 0.0188, 0.0045]
    eigvec = [[-0.5675, 0.7192, 0.4009],
              [-0.5808, -0.0045, -0.8140],
              [-0.5836, -0.6948, 0.4203]]
    np.random.seed(21)
    a = ref.lighting(_chw_frames(1)[0], 0.1, eigval, eigvec)
    np.random.seed(21)
    b = ours.lighting(_chw_frames(1)[0], 0.1, eigval, eigvec)
    _assert_same(a, b)
    np.random.seed(21)
    a = ref.lighting_list(_chw_frames(), 0.1, eigval, eigvec)
    np.random.seed(21)
    b = ours.lighting_list(_chw_frames(), 0.1, eigval, eigvec)
    _assert_same(a, b)
    # alphastd=0 no-op branch
    img = _chw_frames(1)[0]
    _assert_same(ref.lighting(img.copy(), 0, eigval, eigvec),
                 ours.lighting(img.copy(), 0, eigval, eigvec))
