"""Planar YUV 4:2:0 wire format for host->device frame transport.

Video codecs store frames as subsampled planar YUV (4:2:0 = 1.5 bytes/px);
the reference pipeline converts to RGB24 (3 bytes/px) on the host CPU at
decode time (ref: datasets_custom/decoder.py:65-106 via pyav's to_rgb, and
our native/decoder.cc RGB path) and ships RGB to the accelerator. On TPU the
host->device wire is the scoring pipeline's binding constraint for long
videos, and the YUV->RGB conversion is a per-pixel affine map — exactly the
kind of elementwise math XLA fuses into the adjacent gather/normalize kernel
for free. So the TPU-native wire keeps the codec's own 4:2:0 layout end to
end: the native decoder emits packed I420, the host never touches the pixel
data, and the device unpacks + color-converts + normalizes inside the
compiled scoring kernel. Wire bytes drop 2x with no extra host work.

Layout ("packed I420"): a (T, H*3//2, W) uint8 array per clip viewing the
decoder's contiguous byte stream (native/decoder.cc:169-178 packs Y then U
then V with no padding):
  rows [0, H)        Y plane (full resolution)
  rows [H, H*3//2)   chroma bytes: U plane (H//2 * W//2 bytes) immediately
                     followed by V plane (likewise), flattened row-major
H and W must be even (4:2:0 chroma siting). The chroma planes are sliced
from the FLAT byte stream, not from whole rows — for H % 4 == 0 the U
plane happens to occupy exactly rows [H, H+H//4), but for H == 2 (mod 4)
(e.g. 480x270 video) the U plane ends mid-row; byte-flat slicing keeps the
layout exact for any even H.

Color math: BT.601 limited range ("studio swing"), the swscale default for
unflagged SD content and what our mpeg4 test encoder produces. Chroma is
upsampled nearest-neighbor (one 2x2 block per chroma sample); the numeric
delta vs swscale's bilinear chroma filter is quantified in
tests/test_yuv_wire.py and sits below the bf16 quantization noise the
production scoring mode already carries (BENCH.md).
"""

from __future__ import annotations

import numpy as np

# BT.601 luma weights.
_KR, _KG, _KB = 0.299, 0.587, 0.114
# Limited-range excursions: Y spans 219 steps from 16, chroma 224 from 128.
_YSCALE = 219.0 / 255.0
_CSCALE = 224.0 / 255.0
# Inverse-matrix coefficients (see module docstring for the derivation).
_Y_GAIN = 255.0 / 219.0                      # 1.1643836
_R_V = (255.0 / 224.0) * 2.0 * (1.0 - _KR)   # 1.5960267
_B_U = (255.0 / 224.0) * 2.0 * (1.0 - _KB)   # 2.0172321
_G_U = _B_U * _KB / _KG                      # 0.3917623
_G_V = _R_V * _KR / _KG                      # 0.8129676


def packed_height(h: int) -> int:
    """Rows of the packed I420 image for a frame height ``h`` (even)."""
    return h + h // 2


def frame_height(packed_rows: int) -> int:
    """Frame height from packed I420 row count."""
    return (packed_rows * 2) // 3


def pack_rgb(frames: np.ndarray) -> np.ndarray:
    """RGB (T, H, W, 3) uint8 -> packed I420 (T, H*3//2, W) uint8.

    Host-side fallback for sources that are already RGB (synthetic bench
    corpora, .npy fixtures); real videos come out of the native decoder
    already packed (data/video.py read_video_yuv420). Chroma is box-averaged
    over each 2x2 block before subsampling.
    """
    frames = np.asarray(frames)
    assert frames.ndim == 4 and frames.shape[-1] == 3, frames.shape
    T, H, W, _ = frames.shape
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    f = frames.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y_full = _KR * r + _KG * g + _KB * b
    y = 16.0 + _YSCALE * y_full
    u = 128.0 + _CSCALE * 0.5 / (1.0 - _KB) * (b - y_full)
    v = 128.0 + _CSCALE * 0.5 / (1.0 - _KR) * (r - y_full)
    # 2x2 box average then subsample (4:2:0 chroma siting)
    u = u.reshape(T, H // 2, 2, W // 2, 2).mean(axis=(2, 4))
    v = v.reshape(T, H // 2, 2, W // 2, 2).mean(axis=(2, 4))
    out = np.empty((T, packed_height(H), W), np.uint8)
    out[:, :H] = np.clip(np.rint(y), 16, 235)
    chroma = np.concatenate(
        [np.clip(np.rint(u), 16, 240).reshape(T, -1),
         np.clip(np.rint(v), 16, 240).reshape(T, -1)], axis=1)
    out[:, H:] = chroma.reshape(T, H // 2, W)
    return out


def _planes(packed: np.ndarray):
    rows, W = packed.shape[-2:]
    H = frame_height(rows)
    lead = packed.shape[:-2]
    y = packed[..., :H, :]
    # chroma planes are byte-flat after the Y rows (see module docstring) —
    # row-based slicing would only be correct for H % 4 == 0
    chroma = packed[..., H:, :].reshape(*lead, (H // 2) * W)
    q = (H // 2) * (W // 2)
    u = chroma[..., :q].reshape(*lead, H // 2, W // 2)
    v = chroma[..., q:].reshape(*lead, H // 2, W // 2)
    return y, u, v, H, W


def unpack_to_rgb(packed: np.ndarray) -> np.ndarray:
    """Packed I420 (..., H*3//2, W) uint8 -> RGB (..., H, W, 3) uint8.

    Host mirror of the device math in ``unpack_normalize`` (nearest-neighbor
    chroma upsample + BT.601 limited-range inverse), used by tests and by
    CPU-side consumers of YUV-decoded frames.
    """
    y, u, v, H, W = _planes(np.asarray(packed))
    c = (y.astype(np.float32) - 16.0) * _Y_GAIN
    d = np.repeat(np.repeat(u, 2, axis=-2), 2, axis=-1).astype(np.float32) - 128.0
    e = np.repeat(np.repeat(v, 2, axis=-2), 2, axis=-1).astype(np.float32) - 128.0
    rgb = np.stack([c + _R_V * e,
                    c - _G_U * d - _G_V * e,
                    c + _B_U * d], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def crop(packed: np.ndarray, y0: int, x0: int, ch: int, cw: int) -> np.ndarray:
    """Spatial crop of a packed I420 buffer.

    Offsets are rounded DOWN to even so the chroma grid stays aligned (a
    half-chroma-pixel shift vs an exact-odd RGB crop — visually and
    numerically negligible, quantified in tests/test_yuv_wire.py).
    ``ch``/``cw`` must be even.
    """
    assert ch % 2 == 0 and cw % 2 == 0, (ch, cw)
    y0 &= ~1
    x0 &= ~1
    y, u, v, H, W = _planes(np.asarray(packed))
    lead = packed.shape[:-2]
    yc = y[..., y0:y0 + ch, x0:x0 + cw]
    uc = u[..., y0 // 2:(y0 + ch) // 2, x0 // 2:(x0 + cw) // 2]
    vc = v[..., y0 // 2:(y0 + ch) // 2, x0 // 2:(x0 + cw) // 2]
    chroma = np.concatenate(
        [np.ascontiguousarray(uc).reshape(*lead, -1),
         np.ascontiguousarray(vc).reshape(*lead, -1)], axis=-1)
    out = np.concatenate(
        [yc, chroma.reshape(*lead, ch // 2, cw)], axis=-2)
    return np.ascontiguousarray(out)


# ---------------------------------------------------------------------------
# yuv420q: quarter-resolution chroma (wire-bound-link insurance)
#
# 4:2:0 already halves the wire vs RGB; on links where the host->device
# wire still binds (the bench tunnel measures 7-37 MB/s; BENCH.md "The
# wire"), the remaining byte lever is chroma: U/V box-averaged a further
# 4x per axis (1/64th the chroma samples; 1.5 -> ~1.03 B/px, 224px frame
# 75.3 -> 51.7 KB). INVALIDATED on quality: chroma carries real
# DINO-feature signal — measured 16-27% rel score error (1/8 per axis)
# and ~7% even at 1/4 per axis vs the ~3% bf16 floor on the synthetic
# validators (tests/test_yuv_wire.py). Kept as an experimental knob
# (`--wire_format yuv420q`) for revalidation against trained
# checkpoints; NOT a production mode.
#
# Layout: Y rows [0, H) as in I420; then U (H//8 * W//8 bytes) followed by
# V (likewise), byte-flat, zero-padded to whole rows of width W. Requires
# H % 8 == 0 and W % 8 == 0 (scoring crops to 224 first).
# ---------------------------------------------------------------------------


def packed_q_height(h: int, w: int) -> int:
    """Rows of the packed yuv420q image for an (h, w) frame."""
    assert h % 8 == 0 and w % 8 == 0, (h, w)
    return h + -(-2 * (h // 8) * (w // 8) // w)


def frame_height_q(rows: int, w: int) -> int:
    """Frame height from packed yuv420q row count (H % 8 == 0)."""
    h = (32 * rows // 33) // 8 * 8
    while packed_q_height(h, w) < rows:
        h += 8
    assert packed_q_height(h, w) == rows, (rows, w)
    return h


def _chroma_q(u: np.ndarray, v: np.ndarray):
    """Half-res chroma planes -> 4x4 box-averaged eighth-res planes."""
    lead = u.shape[:-2]
    h2, w2 = u.shape[-2:]
    assert h2 % 4 == 0 and w2 % 4 == 0, (h2, w2)
    uq = u.astype(np.float32).reshape(
        *lead, h2 // 4, 4, w2 // 4, 4).mean(axis=(-3, -1))
    vq = v.astype(np.float32).reshape(
        *lead, h2 // 4, 4, w2 // 4, 4).mean(axis=(-3, -1))
    return (np.clip(np.rint(uq), 16, 240).astype(np.uint8),
            np.clip(np.rint(vq), 16, 240).astype(np.uint8))


def _assemble_q(y: np.ndarray, uq: np.ndarray, vq: np.ndarray) -> np.ndarray:
    lead = y.shape[:-2]
    H, W = y.shape[-2:]
    rows = packed_q_height(H, W)
    chroma = np.concatenate([uq.reshape(*lead, -1),
                             vq.reshape(*lead, -1)], axis=-1)
    pad = (rows - H) * W - chroma.shape[-1]
    if pad:
        chroma = np.concatenate(
            [chroma, np.zeros((*lead, pad), np.uint8)], axis=-1)
    return np.ascontiguousarray(np.concatenate(
        [y, chroma.reshape(*lead, rows - H, W)], axis=-2))


def quarter_chroma(packed: np.ndarray) -> np.ndarray:
    """Packed I420 (..., H*3//2, W) -> packed yuv420q (the host-side step
    applied to the native decoder's planes; Y bytes are untouched)."""
    y, u, v, H, W = _planes(np.asarray(packed))
    uq, vq = _chroma_q(u, v)
    return _assemble_q(y, uq, vq)


def pack_rgb_q(frames: np.ndarray) -> np.ndarray:
    """RGB (T, H, W, 3) uint8 -> packed yuv420q, via the I420 pack (so the
    chroma siting matches what quarter_chroma produces from the codec)."""
    return quarter_chroma(pack_rgb(frames))


def _planes_q(packed, w: int):
    rows = packed.shape[-2]
    H = frame_height_q(rows, w)
    lead = packed.shape[:-2]
    y = packed[..., :H, :]
    chroma = packed[..., H:, :].reshape(*lead, (rows - H) * w)
    q = (H // 8) * (w // 8)
    u = chroma[..., :q].reshape(*lead, H // 8, w // 8)
    v = chroma[..., q:2 * q].reshape(*lead, H // 8, w // 8)
    return y, u, v, H


def unpack_q_to_rgb(packed: np.ndarray) -> np.ndarray:
    """Packed yuv420q -> RGB uint8 (host mirror of unpack_normalize_q)."""
    packed = np.asarray(packed)
    y, u, v, H = _planes_q(packed, packed.shape[-1])
    c = (y.astype(np.float32) - 16.0) * _Y_GAIN
    d = np.repeat(np.repeat(u, 8, axis=-2), 8, axis=-1).astype(np.float32) - 128.0
    e = np.repeat(np.repeat(v, 8, axis=-2), 8, axis=-1).astype(np.float32) - 128.0
    rgb = np.stack([c + _R_V * e,
                    c - _G_U * d - _G_V * e,
                    c + _B_U * d], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def crop_q(packed: np.ndarray, y0: int, x0: int, ch: int, cw: int) -> np.ndarray:
    """Spatial crop of a packed yuv420q buffer (offsets rounded down to a
    multiple of 8 so the eighth-res chroma grid stays aligned; ch/cw must
    be multiples of 8)."""
    assert ch % 8 == 0 and cw % 8 == 0, (ch, cw)
    y0 &= ~7
    x0 &= ~7
    packed = np.asarray(packed)
    y, u, v, H = _planes_q(packed, packed.shape[-1])
    yc = np.ascontiguousarray(y[..., y0:y0 + ch, x0:x0 + cw])
    uc = np.ascontiguousarray(
        u[..., y0 // 8:(y0 + ch) // 8, x0 // 8:(x0 + cw) // 8])
    vc = np.ascontiguousarray(
        v[..., y0 // 8:(y0 + ch) // 8, x0 // 8:(x0 + cw) // 8])
    return _assemble_q(yc, uc, vc)


def unpack_normalize_q(packed, mean, std, dtype):
    """Device-side yuv420q unpack (jnp; see unpack_normalize)."""
    import jax.numpy as jnp

    rows, W = packed.shape[-2:]
    H = frame_height_q(rows, W)
    lead = packed.shape[:-2]
    y = packed[..., :H, :]
    chroma = packed[..., H:, :].reshape(*lead, (rows - H) * W)
    q = (H // 8) * (W // 8)
    u = chroma[..., :q].reshape(*lead, H // 8, W // 8)
    v = chroma[..., q:2 * q].reshape(*lead, H // 8, W // 8)
    c = (y.astype(jnp.float32) - 16.0) * _Y_GAIN
    d = jnp.repeat(jnp.repeat(u, 8, axis=-2), 8, axis=-1).astype(jnp.float32) - 128.0
    e = jnp.repeat(jnp.repeat(v, 8, axis=-2), 8, axis=-1).astype(jnp.float32) - 128.0
    rgb = jnp.stack([c + _R_V * e,
                     c - _G_U * d - _G_V * e,
                     c + _B_U * d], axis=-1)
    rgb = jnp.clip(rgb, 0.0, 255.0) / 255.0
    out = (rgb - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    return out.astype(dtype)


def unpack_normalize(packed, mean, std, dtype):
    """Device-side unpack: (..., H*3//2, W) uint8 -> normalized
    (..., H, W, 3) in ``dtype``.

    Traceable jnp math — meant to be called INSIDE a jitted kernel right
    after the window gather so XLA fuses upsample + color matrix + normalize
    into the gather's consumer (the same slot the RGB wire's /255+mean/std
    occupies in engine/scoring.py _gather_views).
    """
    import jax.numpy as jnp

    rows, W = packed.shape[-2:]
    H = frame_height(rows)
    lead = packed.shape[:-2]
    y = packed[..., :H, :]
    # byte-flat chroma slicing — matches _planes for any even H
    chroma = packed[..., H:, :].reshape(*lead, (H // 2) * W)
    q = (H // 2) * (W // 2)
    u = chroma[..., :q].reshape(*lead, H // 2, W // 2)
    v = chroma[..., q:].reshape(*lead, H // 2, W // 2)
    c = (y.astype(jnp.float32) - 16.0) * _Y_GAIN
    d = jnp.repeat(jnp.repeat(u, 2, axis=-2), 2, axis=-1).astype(jnp.float32) - 128.0
    e = jnp.repeat(jnp.repeat(v, 2, axis=-2), 2, axis=-1).astype(jnp.float32) - 128.0
    rgb = jnp.stack([c + _R_V * e,
                     c - _G_U * d - _G_V * e,
                     c + _B_U * d], axis=-1)
    rgb = jnp.clip(rgb, 0.0, 255.0) / 255.0
    out = (rgb - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    return out.astype(dtype)
