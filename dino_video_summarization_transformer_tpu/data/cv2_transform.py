"""cv2 / ndarray transforms (ref: datasets_custom/cv2_transform.py).

Parallel implementations of the tensor transforms operating on numpy
images — single (H, W, C)/(C, H, W) frames or lists of frames — as used by
AVA-style pipelines. Not on the summarization hot path (SURVEY.md §2) but
part of the preprocessing surface; the full reference op set (including the
bounding-box companions) is covered and oracle-tested against the reference
module in tests/test_cv2_transform.py.

Reference quirks preserved deliberately (bit-parity over "fixes"):
  * scale jitter draws the size inverse-uniformly over [1/max, 1/min]
    (ref: cv2_transform.py:45, :487) — NOT uniformly over [min, max];
  * random_crop_list offsets use np.random.randint(0, h - size), whose high
    bound is exclusive, so the bottom/right-most crop is never produced
    (ref: cv2_transform.py:425-430);
  * lighting adds the PCA shift with BGR channel indexing, rgb[2 - idx]
    (ref: cv2_transform.py:294, :577);
  * several ops mutate their inputs in place (color_normalization, lighting,
    crop_boxes, clip_boxes_to_image) — callers relying on that behavior in
    the reference keep working here.

RNG: every random op accepts rng=None -> np.random (matching the
reference's global-seed behavior) or a np.random.RandomState for explicit
threading (the repo-wide determinism policy, SURVEY.md §5).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

from .interp import resize as _np_resize

__all__ = [
    "clip_boxes_to_image", "random_short_side_scale_jitter_list", "scale",
    "scale_boxes", "horizontal_flip_list", "spatial_shift_crop_list",
    "CHW2HWC", "HWC2CHW", "color_jitter_list", "lighting_list",
    "color_normalization", "pad_image", "horizontal_flip", "flip_boxes",
    "crop_boxes", "random_crop_list", "center_crop", "random_scale_jitter",
    "random_scale_jitter_list", "random_sized_crop", "lighting",
    "random_sized_crop_list", "blend", "grayscale", "saturation",
    "brightness", "contrast", "saturation_list", "brightness_list",
    "contrast_list", "color_jitter", "revert_scaled_boxes",
]


def _resize_img(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """cv2 INTER_LINEAR resize (HWC), numpy bilinear fallback without cv2."""
    if _HAS_CV2:
        return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
    chw = np.moveaxis(np.asarray(img, np.float32), -1, 0)[None]
    out = _np_resize(chw, (h, w), mode="bilinear")[0]
    return np.moveaxis(out, 0, -1)


def _short_side_dims(h: int, w: int, size: int) -> Optional[Tuple[int, int]]:
    """(new_h, new_w) scaling the short side to ``size``; None = no-op."""
    if (w <= h and w == size) or (h <= w and h == size):
        return None
    if w < h:
        return int(math.floor(float(h) / w * size)), size
    return size, int(math.floor(float(w) / h * size))


def _inverse_uniform_size(min_size: int, max_size: int, rng) -> int:
    # ResNet-style jitter: scale ~ 1/U(1/max, 1/min) (ref quirk, see header)
    return int(round(1.0 / rng.uniform(1.0 / max_size, 1.0 / min_size)))


# ---------------------------------------------------------------------------
# Box ops
# ---------------------------------------------------------------------------

def clip_boxes_to_image(boxes: np.ndarray, height: int, width: int) -> np.ndarray:
    """Clamp (num_boxes, 4) xyxy boxes into the image (in place)."""
    boxes[:, [0, 2]] = np.clip(boxes[:, [0, 2]], 0.0, width - 1.0)
    boxes[:, [1, 3]] = np.clip(boxes[:, [1, 3]], 0.0, height - 1.0)
    return boxes


def scale_boxes(size: int, boxes: np.ndarray, height: int, width: int) -> np.ndarray:
    """Rescale boxes (in place) to match a short-side-``size`` image scale."""
    dims = _short_side_dims(height, width, size)
    if dims is None:
        return boxes
    nh, nw = dims
    boxes *= (float(nh) / height) if width < height else (float(nw) / width)
    return boxes


def flip_boxes(boxes: np.ndarray, im_width: int) -> np.ndarray:
    """Mirror xyxy boxes horizontally (returns a copy)."""
    out = boxes.copy()
    out[:, 0::4] = im_width - boxes[:, 2::4] - 1
    out[:, 2::4] = im_width - boxes[:, 0::4] - 1
    return out


def crop_boxes(boxes: np.ndarray, x_offset: int, y_offset: int) -> np.ndarray:
    """Shift boxes (in place) by a crop's top-left corner."""
    boxes[:, [0, 2]] -= x_offset
    boxes[:, [1, 3]] -= y_offset
    return boxes


def revert_scaled_boxes(size: int, boxes: np.ndarray, img_height: int,
                        img_width: int) -> np.ndarray:
    """Undo a short-side-``size`` scale, mapping boxes back to the original."""
    return boxes * (np.min([img_height, img_width]) / size)


# ---------------------------------------------------------------------------
# Geometry (single image)
# ---------------------------------------------------------------------------

def scale(size: int, image: np.ndarray) -> np.ndarray:
    """Short-side scale of one HWC frame; float32 out (no-op keeps dtype)."""
    dims = _short_side_dims(image.shape[0], image.shape[1], size)
    if dims is None:
        return image
    return _resize_img(image, *dims).astype(np.float32)


def center_crop(size: int, image: np.ndarray) -> np.ndarray:
    """Center ``size`` x ``size`` crop of one HWC frame."""
    h, w = image.shape[:2]
    y = int(math.ceil((h - size) / 2))
    x = int(math.ceil((w - size) / 2))
    out = image[y:y + size, x:x + size, :]
    assert out.shape[0] == size and out.shape[1] == size, "bad center crop"
    return out


def pad_image(image: np.ndarray, pad_size: int, order: str = "CHW") -> np.ndarray:
    """Zero-pad the two spatial dims by ``pad_size`` on each side."""
    spatial = ((pad_size, pad_size), (pad_size, pad_size))
    pads = ((0, 0),) + spatial if order == "CHW" else spatial + ((0, 0),)
    return np.pad(image, pads, mode="constant")


def horizontal_flip(prob: float, image: np.ndarray, order: str = "CHW",
                    rng=None) -> np.ndarray:
    """Flip one frame horizontally with probability ``prob``."""
    assert order in ("CHW", "HWC"), order
    rng = rng or np.random
    if rng.uniform() < prob:
        image = image[:, :, ::-1] if order == "CHW" else image[:, ::-1, :]
    return image


def random_scale_jitter(image: np.ndarray, min_size: int, max_size: int,
                        rng=None) -> np.ndarray:
    """ResNet-style inverse-uniform short-side jitter of one frame."""
    rng = rng or np.random
    return scale(_inverse_uniform_size(min_size, max_size, rng), image)


def random_sized_crop(image: np.ndarray, size: int, area_frac: float = 0.08,
                      rng=None) -> np.ndarray:
    """Inception-style crop: 10 tries at area in [area_frac, 1] and aspect
    in [3/4, 4/3], else fall back to center-crop(scale(size))."""
    rng = rng or np.random
    for _ in range(10):
        box = _sample_sized_crop(image.shape[0], image.shape[1],
                                 size, area_frac, rng)
        if box is not None:
            y, x, h, w = box
            crop = image[y:y + h, x:x + w, :]
            assert crop.shape[0] == h and crop.shape[1] == w, "bad crop"
            return _resize_img(crop, size, size).astype(np.float32)
    return center_crop(size, scale(size, image))


def _sample_sized_crop(height, width, size, area_frac, rng):
    """One attempt of the Inception crop sampler; (y, x, h, w) or None.

    RNG draw order matches the reference exactly (area, aspect, swap-coin,
    then the two offsets) so seeded runs are bit-identical."""
    target_area = rng.uniform(area_frac, 1.0) * (height * width)
    aspect = rng.uniform(3.0 / 4.0, 4.0 / 3.0)
    w = int(round(math.sqrt(float(target_area) * aspect)))
    h = int(round(math.sqrt(float(target_area) / aspect)))
    if rng.uniform() < 0.5:
        w, h = h, w
    if h <= height and w <= width:
        y = 0 if height == h else int(rng.randint(0, height - h))
        x = 0 if width == w else int(rng.randint(0, width - w))
        return y, x, h, w
    return None


# ---------------------------------------------------------------------------
# Geometry (frame lists, with optional box companions)
# ---------------------------------------------------------------------------

def random_short_side_scale_jitter_list(
    images: List[np.ndarray], min_size: int, max_size: int,
    boxes: Optional[list] = None, rng=None,
):
    """Shared inverse-uniform short-side jitter over a list of HWC frames;
    ``boxes`` is a list of per-frame (num_boxes, 4) arrays, rescaled."""
    rng = rng or np.random
    size = _inverse_uniform_size(min_size, max_size, rng)
    h, w = images[0].shape[:2]
    dims = _short_side_dims(h, w, size)
    if dims is None:
        return images, boxes
    nh, nw = dims
    if boxes is not None:
        r = (float(nh) / h) if w < h else (float(nw) / w)
        boxes = [b * r for b in boxes]
    return [_resize_img(im, nh, nw).astype(np.float32)
            for im in images], boxes


def random_scale_jitter_list(images: List[np.ndarray], min_size: int,
                             max_size: int, rng=None) -> List[np.ndarray]:
    """Inverse-uniform jitter with one shared scale for the whole list."""
    rng = rng or np.random
    size = _inverse_uniform_size(min_size, max_size, rng)
    return [scale(size, im) for im in images]


def random_crop_list(images: List[np.ndarray], size: int, pad_size: int = 0,
                     order: str = "CHW", boxes: Optional[list] = None,
                     rng=None):
    """Shared random crop over a list of frames (CHW or HWC).

    Offset high bound is EXCLUSIVE (reference quirk — the extreme
    bottom/right crop never occurs)."""
    assert order in ("CHW", "HWC"), order
    rng = rng or np.random
    if pad_size > 0:
        images = [pad_image(im, pad_size, order=order) for im in images]
    hw_axes = (1, 2) if order == "CHW" else (0, 1)
    h, w = (images[0].shape[hw_axes[0]], images[0].shape[hw_axes[1]])
    if h == size and w == size:
        return images, boxes
    y = int(rng.randint(0, h - size)) if h > size else 0
    x = int(rng.randint(0, w - size)) if w > size else 0
    if order == "CHW":
        out = [im[:, y:y + size, x:x + size] for im in images]
    else:
        out = [im[y:y + size, x:x + size, :] for im in images]
    assert out[0].shape[hw_axes[0]] == size, "bad random crop"
    assert out[0].shape[hw_axes[1]] == size, "bad random crop"
    if boxes is not None:
        boxes = [crop_boxes(b, x, y) for b in boxes]
    return out, boxes


def spatial_shift_crop_list(size: int, images: List[np.ndarray],
                            spatial_shift_pos: int,
                            boxes: Optional[list] = None):
    """Left/center/right (or top/center/bottom) crop of HWC frames."""
    assert spatial_shift_pos in (0, 1, 2)
    h, w = images[0].shape[:2]
    y = int(math.ceil((h - size) / 2))
    x = int(math.ceil((w - size) / 2))
    if h > w:
        if spatial_shift_pos == 0:
            y = 0
        elif spatial_shift_pos == 2:
            y = h - size
    else:
        if spatial_shift_pos == 0:
            x = 0
        elif spatial_shift_pos == 2:
            x = w - size
    out = [im[y:y + size, x:x + size, :] for im in images]
    assert out[0].shape[0] == size and out[0].shape[1] == size, "bad crop"
    if boxes is not None:
        for b in boxes:
            b[:, [0, 2]] -= x
            b[:, [1, 3]] -= y
    return out, boxes


def horizontal_flip_list(prob: float, images: List[np.ndarray],
                         order: str = "CHW", boxes: Optional[list] = None,
                         rng=None):
    """Shared-coin horizontal flip of a frame list (+ mirrored boxes)."""
    rng = rng or np.random
    width = images[0].shape[1]
    if rng.uniform() < prob:
        if boxes is not None:
            boxes = [flip_boxes(b, width) for b in boxes]
        if order == "CHW":
            # match the reference's swapaxes(2,0) route: flips W for
            # (C, H, W) inputs via the HWC view
            out = [im.swapaxes(2, 0)[::-1].swapaxes(0, 2) for im in images]
            return out, boxes
        if order == "HWC":
            if _HAS_CV2:
                return [cv2.flip(im, 1) for im in images], boxes
            return [im[:, ::-1, :].copy() for im in images], boxes
    return images, boxes


def random_sized_crop_list(images: List[np.ndarray], size: int,
                           crop_area_fraction: float = 0.08,
                           rng=None) -> List[np.ndarray]:
    """Inception-style crop with one shared geometry for the whole list."""
    rng = rng or np.random
    for _ in range(10):
        box = _sample_sized_crop(images[0].shape[0], images[0].shape[1],
                                 size, crop_area_fraction, rng)
        if box is not None:
            y, x, h, w = box
            out = []
            for im in images:
                crop = im[y:y + h, x:x + w, :]
                assert crop.shape[0] == h and crop.shape[1] == w, "bad crop"
                out.append(_resize_img(crop, size, size).astype(np.float32))
            return out
    return [center_crop(size, scale(size, im)) for im in images]


def CHW2HWC(image: np.ndarray) -> np.ndarray:
    return image.transpose([1, 2, 0])


def HWC2CHW(image: np.ndarray) -> np.ndarray:
    return image.transpose([2, 0, 1])


# ---------------------------------------------------------------------------
# Color (CHW float frames)
# ---------------------------------------------------------------------------

def color_normalization(image: np.ndarray, mean: Sequence[float],
                        stddev: Sequence[float]) -> np.ndarray:
    """Per-channel (x - mean) / std of one CHW frame (in place)."""
    assert len(mean) == image.shape[0], "channel mean mismatch"
    assert len(stddev) == image.shape[0], "channel stddev mismatch"
    for c in range(image.shape[0]):
        image[c] = (image[c] - mean[c]) / stddev[c]
    return image


def blend(image1: np.ndarray, image2: np.ndarray, alpha: float) -> np.ndarray:
    return image1 * alpha + image2 * (1 - alpha)


def grayscale(image: np.ndarray) -> np.ndarray:
    """Luma replicated to all channels; input is CHW in BGR order
    (channel 2 carries R — ref: cv2_transform.py:644)."""
    gray = 0.299 * image[2] + 0.587 * image[1] + 0.114 * image[0]
    out = np.copy(image)
    out[0] = gray
    out[1] = gray
    out[2] = gray
    return out


def brightness(var: float, image: np.ndarray, rng=None) -> np.ndarray:
    rng = rng or np.random
    alpha = 1.0 + rng.uniform(-var, var)
    return blend(image, np.zeros(image.shape).astype(image.dtype), alpha)


def contrast(var: float, image: np.ndarray, rng=None) -> np.ndarray:
    rng = rng or np.random
    gray = grayscale(image)
    gray.fill(np.mean(gray[0]))
    return blend(image, gray, 1.0 + rng.uniform(-var, var))


def saturation(var: float, image: np.ndarray, rng=None) -> np.ndarray:
    rng = rng or np.random
    return blend(image, grayscale(image), 1.0 + rng.uniform(-var, var))


def brightness_list(var: float, images: List[np.ndarray],
                    rng=None) -> List[np.ndarray]:
    rng = rng or np.random
    alpha = 1.0 + rng.uniform(-var, var)
    return [blend(im, np.zeros(im.shape).astype(im.dtype), alpha)
            for im in images]


def contrast_list(var: float, images: List[np.ndarray],
                  rng=None) -> List[np.ndarray]:
    rng = rng or np.random
    alpha = 1.0 + rng.uniform(-var, var)
    out = []
    for im in images:
        gray = grayscale(im)
        gray.fill(np.mean(gray[0]))
        out.append(blend(im, gray, alpha))
    return out


def saturation_list(var: float, images: List[np.ndarray],
                    rng=None) -> List[np.ndarray]:
    rng = rng or np.random
    alpha = 1.0 + rng.uniform(-var, var)
    return [blend(im, grayscale(im), alpha) for im in images]


def _jitter_order(img_brightness, img_contrast, img_saturation, rng):
    kinds = [k for k, v in (("brightness", img_brightness),
                            ("contrast", img_contrast),
                            ("saturation", img_saturation)) if v != 0]
    if not kinds:
        return []
    return [kinds[i] for i in rng.permutation(np.arange(len(kinds)))]


def color_jitter(image: np.ndarray, img_brightness=0, img_contrast=0,
                 img_saturation=0, rng=None) -> np.ndarray:
    """Randomly ordered brightness/contrast/saturation jitter, one frame."""
    rng = rng or np.random
    for kind in _jitter_order(img_brightness, img_contrast,
                              img_saturation, rng):
        if kind == "brightness":
            image = brightness(img_brightness, image, rng=rng)
        elif kind == "contrast":
            image = contrast(img_contrast, image, rng=rng)
        else:
            image = saturation(img_saturation, image, rng=rng)
    return image


def color_jitter_list(images: List[np.ndarray], img_brightness=0,
                      img_contrast=0, img_saturation=0,
                      rng=None) -> List[np.ndarray]:
    """Randomly ordered brightness/contrast/saturation jitter, shared alpha
    across the list."""
    rng = rng or np.random
    for kind in _jitter_order(img_brightness, img_contrast,
                              img_saturation, rng):
        if kind == "brightness":
            images = brightness_list(img_brightness, images, rng=rng)
        elif kind == "contrast":
            images = contrast_list(img_contrast, images, rng=rng)
        else:
            images = saturation_list(img_saturation, images, rng=rng)
    return images


def lighting(img: np.ndarray, alphastd: float, eigval, eigvec,
             rng=None) -> np.ndarray:
    """AlexNet-style PCA color jitter of one CHW frame (in place).

    The PCA shift is indexed rgb[2 - c] onto channel c — the reference's
    BGR-ordered quirk (ref: cv2_transform.py:577)."""
    if alphastd == 0:
        return img
    rng = rng or np.random
    rgb = _pca_shift(alphastd, eigval, eigvec, rng)
    for c in range(img.shape[0]):
        img[c] = img[c] + rgb[2 - c]
    return img


def lighting_list(imgs: List[np.ndarray], alphastd: float, eigval, eigvec,
                  alpha=None, rng=None) -> List[np.ndarray]:
    """PCA jitter with one shared draw for the whole list (in place)."""
    if alphastd == 0:
        return imgs
    rng = rng or np.random
    rgb = _pca_shift(alphastd, eigval, eigvec, rng)
    out = []
    for img in imgs:
        for c in range(img.shape[0]):
            img[c] = img[c] + rgb[2 - c]
        out.append(img)
    return out


def _pca_shift(alphastd, eigval, eigvec, rng) -> np.ndarray:
    alpha = rng.normal(0, alphastd, size=(1, 3))
    eig_vec = np.array(eigvec)
    eig_val = np.reshape(eigval, (1, 3))
    return np.sum(eig_vec * np.repeat(alpha, 3, axis=0)
                  * np.repeat(eig_val, 3, axis=0), axis=1)
