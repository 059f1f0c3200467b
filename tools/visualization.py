#!/usr/bin/env python
"""Loss-curve plotting and tensor-to-video export
(ref: testing/visualization.py:7-70)."""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plot_loss(loss_file_path: str, sampling_rate: int, plot_path: str,
              key: str | None = None, selected_frames=None) -> None:
    """Per-video loss curve, optionally with selected frames scattered
    (ref: testing/visualization.py:7-51)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(loss_file_path, "r") as f:
        data = json.load(f)
    if key is None:
        key = next(iter(data))
    losses = np.asarray(data[key], np.float64)
    x = np.arange(len(losses)) * sampling_rate

    plt.figure(figsize=(10, 4))
    plt.plot(x, losses, label="DINO loss")
    if selected_frames is not None:
        sel = np.asarray(selected_frames)
        rows = np.clip(sel // sampling_rate, 0, len(losses) - 1)
        plt.scatter(sel, losses[rows], color="red", zorder=3,
                    label="selected frames")
    plt.xlabel("frame index")
    plt.ylabel("loss")
    plt.title(key)
    plt.legend()
    os.makedirs(os.path.dirname(plot_path) or ".", exist_ok=True)
    plt.savefig(plot_path, bbox_inches="tight")
    plt.close()


def save_tensor_as_video(frames, path: str, fps: float = 30.0) -> None:
    """(T, C, H, W) or (C, T, H, W) float/uint8 -> encoded video
    (ref: testing/visualization.py:54-61), via the native encoder."""
    from dino_video_summarization_transformer_tpu.data import video as vio

    arr = np.asarray(frames)
    if arr.shape[0] == 3 and arr.shape[1] != 3:
        arr = np.moveaxis(arr, 0, 1)  # C T H W -> T C H W
    arr = np.moveaxis(arr, 1, -1)  # T C H W -> T H W C
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 1) * 255 if arr.max() <= 1.5 else np.clip(arr, 0, 255)
        arr = arr.astype(np.uint8)
    vio.write_video(path, arr, fps=fps)


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser("loss plot")
    p.add_argument("--loss_file", required=True)
    p.add_argument("--key", default=None)
    p.add_argument("--sampling_rate", default=4, type=int)
    p.add_argument("--out", default="loss_plot.png")
    a = p.parse_args()
    plot_loss(a.loss_file, a.sampling_rate, a.out, key=a.key)
