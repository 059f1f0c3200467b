"""Image-domain DINO augmentation (PIL), for the 2D ViT training path
(ref: train_ssl.py:694-739, utils/utils.py:36-68).

PIL-based like the reference's torchvision transforms: RandomResizedCrop
(bicubic), horizontal flip, ColorJitter(0.4/0.4/0.2/0.1), grayscale,
GaussianBlur, Solarization, ImageNet normalization. Returns numpy CHW
float32 crops.
"""

from __future__ import annotations

import math
import random
from typing import List

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter, ImageOps

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


class GaussianBlur:
    """(ref: utils/utils.py:36-55)."""

    def __init__(self, p=0.5, radius_min=0.1, radius_max=2.0, rng=None):
        self.prob = p
        self.radius_min = radius_min
        self.radius_max = radius_max
        self.rng = rng or random

    def __call__(self, img: Image.Image) -> Image.Image:
        if self.rng.random() > self.prob:
            return img
        return img.filter(ImageFilter.GaussianBlur(
            radius=self.rng.uniform(self.radius_min, self.radius_max)))


class Solarization:
    """(ref: utils/utils.py:58-68)."""

    def __init__(self, p, rng=None):
        self.p = p
        self.rng = rng or random

    def __call__(self, img: Image.Image) -> Image.Image:
        if self.rng.random() < self.p:
            return ImageOps.solarize(img)
        return img


def random_resized_crop_pil(img: Image.Image, size: int, scale, rng,
                            ratio=(3.0 / 4.0, 4.0 / 3.0)) -> Image.Image:
    """torchvision RandomResizedCrop semantics (10 tries then center)."""
    w, h = img.size
    area = w * h
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(math.log(ratio[0]), math.log(ratio[1])))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            i = int(rng.uniform(0, h - ch + 1))
            j = int(rng.uniform(0, w - cw + 1))
            return img.resize((size, size), Image.BICUBIC,
                              box=(j, i, j + cw, i + ch))
    in_ratio = w / h
    if in_ratio < min(ratio):
        cw, ch = w, int(round(w / min(ratio)))
    elif in_ratio > max(ratio):
        ch, cw = h, int(round(h * max(ratio)))
    else:
        cw, ch = w, h
    i, j = (h - ch) // 2, (w - cw) // 2
    return img.resize((size, size), Image.BICUBIC, box=(j, i, j + cw, i + ch))


def color_jitter_pil(img: Image.Image, rng, brightness=0.4, contrast=0.4,
                     saturation=0.2, hue=0.1) -> Image.Image:
    ops = []
    if brightness:
        ops.append(("brightness", rng.uniform(max(0, 1 - brightness), 1 + brightness)))
    if contrast:
        ops.append(("contrast", rng.uniform(max(0, 1 - contrast), 1 + contrast)))
    if saturation:
        ops.append(("saturation", rng.uniform(max(0, 1 - saturation), 1 + saturation)))
    if hue:
        ops.append(("hue", rng.uniform(-hue, hue)))
    rng.shuffle(ops)
    for name, f in ops:
        if name == "brightness":
            img = ImageEnhance.Brightness(img).enhance(f)
        elif name == "contrast":
            img = ImageEnhance.Contrast(img).enhance(f)
        elif name == "saturation":
            img = ImageEnhance.Color(img).enhance(f)
        else:  # hue shift via HSV roll
            hsv = np.asarray(img.convert("HSV"), np.uint8).copy()
            hsv[..., 0] = (hsv[..., 0].astype(np.int32)
                           + int(f * 255)) % 256
            img = Image.fromarray(hsv, "HSV").convert("RGB")
    return img


def to_normalized_chw(img: Image.Image) -> np.ndarray:
    arr = np.asarray(img, np.float32) / 255.0
    arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
    return np.moveaxis(arr, -1, 0)


class DataAugmentationDINO:
    """(ref: train_ssl.py:694-739): 2 global 224 crops + N local 96 crops."""

    def __init__(self, global_crops_scale=(0.4, 1.0),
                 local_crops_scale=(0.05, 0.4), local_crops_number=8,
                 rng=None):
        self.global_crops_scale = global_crops_scale
        self.local_crops_scale = local_crops_scale
        self.local_crops_number = local_crops_number
        self.rng = rng or random.Random()

    def _flip_jitter_gray(self, img):
        if self.rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        if self.rng.random() < 0.8:
            img = color_jitter_pil(img, self.rng)
        if self.rng.random() < 0.2:
            img = img.convert("L").convert("RGB")
        return img

    def __call__(self, image: Image.Image) -> List[np.ndarray]:
        g1 = random_resized_crop_pil(image, 224, self.global_crops_scale, self.rng)
        g1 = GaussianBlur(1.0, rng=self.rng)(self._flip_jitter_gray(g1))
        g2 = random_resized_crop_pil(image, 224, self.global_crops_scale, self.rng)
        g2 = Solarization(0.2, rng=self.rng)(
            GaussianBlur(0.1, rng=self.rng)(self._flip_jitter_gray(g2)))
        crops = [to_normalized_chw(g1), to_normalized_chw(g2)]
        for _ in range(self.local_crops_number):
            lc = random_resized_crop_pil(image, 96, self.local_crops_scale, self.rng)
            lc = GaussianBlur(0.5, rng=self.rng)(self._flip_jitter_gray(lc))
            crops.append(to_normalized_chw(lc))
        return crops
