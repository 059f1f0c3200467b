#!/usr/bin/env python
"""Optical-flow visualization with the standard Middlebury colorwheel
(ref: datasets_custom/preprocessing/flow_vis.py — same public-domain
colorwheel construction by Baker et al.)."""

import argparse

import numpy as np


def make_colorwheel() -> np.ndarray:
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    cw = np.zeros((ncols, 3))
    col = 0
    cw[0:RY, 0] = 255
    cw[0:RY, 1] = np.floor(255 * np.arange(0, RY) / RY)
    col += RY
    cw[col:col + YG, 0] = 255 - np.floor(255 * np.arange(0, YG) / YG)
    cw[col:col + YG, 1] = 255
    col += YG
    cw[col:col + GC, 1] = 255
    cw[col:col + GC, 2] = np.floor(255 * np.arange(0, GC) / GC)
    col += GC
    cw[col:col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    cw[col:col + CB, 2] = 255
    col += CB
    cw[col:col + BM, 2] = 255
    cw[col:col + BM, 0] = np.floor(255 * np.arange(0, BM) / BM)
    col += BM
    cw[col:col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    cw[col:col + MR, 0] = 255
    return cw


def flow_to_color(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """(H, W) flow components -> (H, W, 3) uint8 color image."""
    cw = make_colorwheel()
    ncols = cw.shape[0]
    rad = np.sqrt(u ** 2 + v ** 2)
    rad_max = max(rad.max(), 1e-8)
    u, v = u / rad_max, v / rad_max
    rad = np.sqrt(u ** 2 + v ** 2)
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(int)
    k1 = (k0 + 1) % ncols
    f = fk - k0
    img = np.zeros(u.shape + (3,), np.uint8)
    for i in range(3):
        col0 = cw[k0, i] / 255.0
        col1 = cw[k1, i] / 255.0
        col = (1 - f) * col0 + f * col1
        idx = rad <= 1
        col[idx] = 1 - rad[idx] * (1 - col[idx])
        col[~idx] *= 0.75
        img[..., i] = np.floor(255 * col)
    return img


if __name__ == "__main__":
    p = argparse.ArgumentParser("flow visualization")
    p.add_argument("flow_npy", help=".npy file with (H, W, 2) flow")
    p.add_argument("--out", default="flow_vis.png")
    a = p.parse_args()
    flow = np.load(a.flow_npy)
    img = flow_to_color(flow[..., 0], flow[..., 1])
    from PIL import Image

    Image.fromarray(img).save(a.out)
    print(f"-> {a.out}")
