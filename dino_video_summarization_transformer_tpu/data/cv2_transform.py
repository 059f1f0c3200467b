"""cv2 / ndarray list-based transforms (ref: datasets_custom/cv2_transform.py).

Parallel implementations of the tensor transforms operating on lists of
(H, W, C) uint8/float frames, as used by AVA-style pipelines. Not on the
summarization hot path (SURVEY.md section 2) but part of the preprocessing
surface. Uses OpenCV when present, falling back to the torch-parity numpy
resize kernels.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

from .interp import resize as _np_resize


def _resize_img(img: np.ndarray, h: int, w: int) -> np.ndarray:
    if _HAS_CV2:
        return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR).astype(
            img.dtype)
    chw = np.moveaxis(img.astype(np.float32), -1, 0)[None]
    out = _np_resize(chw, (h, w), mode="bilinear")[0]
    return np.moveaxis(out, 0, -1).astype(img.dtype)


def random_short_side_scale_jitter_list(
    images: List[np.ndarray], min_size: int, max_size: int, rng=None,
) -> List[np.ndarray]:
    """(ref: cv2_transform.py random_short_side_scale_jitter_list)."""
    rng = rng or np.random
    size = int(round(rng.uniform(min_size, max_size)))
    h, w = images[0].shape[:2]
    if (w <= h and w == size) or (h <= w and h == size):
        return images
    if w < h:
        nw, nh = size, int(math.floor(h / w * size))
    else:
        nw, nh = int(math.floor(w / h * size)), size
    return [_resize_img(im, nh, nw) for im in images]


def scale(size: int, image: np.ndarray) -> np.ndarray:
    """Short-side scale of a single frame (ref: cv2_transform.py scale)."""
    h, w = image.shape[:2]
    if (w <= h and w == size) or (h <= w and h == size):
        return image
    if w < h:
        nw, nh = size, int(math.floor(h / w * size))
    else:
        nw, nh = int(math.floor(w / h * size)), size
    return _resize_img(image, nh, nw)


def random_crop_list(images: List[np.ndarray], size: int, rng=None,
                     pad_size: int = 0) -> Tuple[List[np.ndarray], None]:
    rng = rng or np.random
    if pad_size > 0:
        images = [np.pad(im, ((pad_size, pad_size), (pad_size, pad_size),
                              (0, 0))) for im in images]
    h, w = images[0].shape[:2]
    y = int(rng.randint(0, h - size + 1)) if h > size else 0
    x = int(rng.randint(0, w - size + 1)) if w > size else 0
    return [im[y:y + size, x:x + size] for im in images], None


def spatial_shift_crop_list(size: int, images: List[np.ndarray],
                            spatial_shift_pos: int) -> Tuple[List[np.ndarray], None]:
    """Left/center/right crop (ref: cv2_transform.py spatial_shift_crop_list)."""
    assert spatial_shift_pos in (0, 1, 2)
    h, w = images[0].shape[:2]
    y = int(math.ceil((h - size) / 2))
    x = int(math.ceil((w - size) / 2))
    if h > w:
        y = 0 if spatial_shift_pos == 0 else (h - size if spatial_shift_pos == 2 else y)
    else:
        x = 0 if spatial_shift_pos == 0 else (w - size if spatial_shift_pos == 2 else x)
    return [im[y:y + size, x:x + size] for im in images], None


def horizontal_flip_list(prob: float, images: List[np.ndarray], rng=None,
                         order: str = "CHW") -> Tuple[List[np.ndarray], None]:
    rng = rng or np.random
    if rng.uniform() < prob:
        axis = -1 if order == "CHW" else 1
        images = [np.flip(im, axis=axis).copy() for im in images]
    return images, None


def color_normalization(image: np.ndarray, mean, stddev) -> np.ndarray:
    """Per-channel normalize, CHW float (ref: cv2_transform.py color_normalization)."""
    mean = np.asarray(mean, np.float32).reshape(-1, 1, 1)
    std = np.asarray(stddev, np.float32).reshape(-1, 1, 1)
    return (image - mean) / std


def blend(image1, image2, alpha):
    return image1 * alpha + image2 * (1 - alpha)


def grayscale(image: np.ndarray) -> np.ndarray:
    """CHW, BGR-order weights (ref: cv2_transform.py grayscale)."""
    gray = 0.299 * image[2] + 0.587 * image[1] + 0.114 * image[0]
    out = image.copy()
    out[0] = gray
    out[1] = gray
    out[2] = gray
    return out


def color_jitter_list(images: List[np.ndarray], img_brightness=0,
                      img_contrast=0, img_saturation=0, rng=None):
    rng = rng or np.random
    jitter = []
    if img_brightness:
        jitter.append("brightness")
    if img_contrast:
        jitter.append("contrast")
    if img_saturation:
        jitter.append("saturation")
    if jitter:
        order = rng.permutation(np.arange(len(jitter)))
        for idx in range(len(jitter)):
            kind = jitter[order[idx]]
            alpha = 1.0 + rng.uniform(
                -{"brightness": img_brightness, "contrast": img_contrast,
                  "saturation": img_saturation}[kind],
                {"brightness": img_brightness, "contrast": img_contrast,
                 "saturation": img_saturation}[kind])
            if kind == "brightness":
                images = [blend(im, np.zeros_like(im), alpha) for im in images]
            elif kind == "contrast":
                grays = [grayscale(im) for im in images]
                grays = [np.full_like(g, g.mean()) for g in grays]
                images = [blend(im, g, alpha) for im, g in zip(images, grays)]
            else:
                images = [blend(im, grayscale(im), alpha) for im in images]
    return images
