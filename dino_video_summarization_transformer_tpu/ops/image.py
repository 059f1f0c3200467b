"""On-device image ops: RandConv augmentation, Sobel filtering, optical-flow
helpers (ref: datasets_custom/rand_conv.py:8-29, kinetics.py:314-329 kornia
sobel, utils/utils.py:634-647 flow/diff helpers).
"""

from __future__ import annotations

import glob
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def rand_conv(rng: jax.Array, image: jnp.ndarray, kernel_size: int = 3,
              alpha: float = 0.7) -> jnp.ndarray:
    """Random-convolution augmentation (ref: rand_conv.py:8-29):
    filter with a fresh N(0, 1/(sqrt(3)k)) 3->3 conv, blend with alpha.
    image (B, C, H, W) or (B, C, T, H, W)."""
    std = 1.0 / (np.sqrt(3) * kernel_size)
    w = std * jax.random.normal(rng, (kernel_size, kernel_size, 3, 3),
                                image.dtype)
    temporal = image.ndim == 5
    x = image
    if temporal:
        B, C, T, H, W = x.shape
        x = x.transpose(0, 2, 1, 3, 4).reshape(B * T, C, H, W)
    xh = x.transpose(0, 2, 3, 1)  # NHWC
    pad = kernel_size // 2
    y = jax.lax.conv_general_dilated(
        xh, w, window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.transpose(0, 3, 1, 2)
    if temporal:
        y = y.reshape(B, T, C, H, W).transpose(0, 2, 1, 3, 4)
    return alpha * image + (1 - alpha) * y


_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32) / 8.0
_SOBEL_Y = _SOBEL_X.T


def sobel(images: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Sobel gradient magnitude matching kornia.filters.sobel
    (ref: kinetics.py:319): per-channel normalized 3x3 kernels, reflect
    padding, magnitude sqrt(gx^2+gy^2+eps). images (B, C, H, W)."""
    B, C, H, W = images.shape
    x = images.reshape(B * C, 1, H, W).transpose(0, 2, 3, 1)  # NHWC, 1 chan
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    kx = jnp.asarray(_SOBEL_X, images.dtype)[..., None, None]
    ky = jnp.asarray(_SOBEL_Y, images.dtype)[..., None, None]

    def conv(inp, k):
        return jax.lax.conv_general_dilated(
            inp, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    gx = conv(x, kx)
    gy = conv(x, ky)
    mag = jnp.sqrt(gx * gx + gy * gy + eps)
    return mag.transpose(0, 3, 1, 2).reshape(B, C, H, W)


def load_flow_folder(dir_path: str) -> Optional[np.ndarray]:
    """Load a folder of flow JPEGs as (T, C, H, W) float in [0,1]
    (ref: kinetics.py:348-353)."""
    from PIL import Image

    paths = sorted(glob.glob(f"{dir_path}/*.jpg"))
    if not paths:
        return None
    frames = [np.asarray(Image.open(p), np.float32) / 255.0 for p in paths]
    arr = np.stack(frames)
    if arr.ndim == 3:
        arr = arr[..., None]
    return np.moveaxis(arr, -1, 1)
