#!/usr/bin/env python
"""Standalone adaptive/uniform frame extraction for one video
(ref: testing/extract_video_adaptive.py:43-153): writes `<name>_u.mp4`
(uniform selection) and `<name>_a.mp4` (adaptive selection) plus a loss
plot with the selected frames marked — the closest thing the reference has
to an end-to-end integration test."""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dino_video_summarization_transformer_tpu.data import selection as sel
from dino_video_summarization_transformer_tpu.data import video as vio
from tools.visualization import plot_loss


def extract(video_path: str, loss_file: str, num_frames: int,
            pre_sampling_rate: int, out_dir: str, fps: float = 2.0,
            sharpen: bool = False):
    key = os.path.splitext(os.path.basename(video_path))[0]
    with open(loss_file) as f:
        losses = json.load(f)[key]

    info = vio.video_info(video_path)
    frames, _ = vio.read_video(video_path, stride=pre_sampling_rate)
    n_pre = frames.shape[0]
    num_unsampled = info["num_frames"] or n_pre * pre_sampling_rate

    a_idx, a_rows = sel.adaptive_indices(
        losses, num_frames, pre_sampling_rate, n_pre, num_unsampled,
        sharpen=sharpen)
    u_idx, u_rows = sel.uniform_indices(num_frames, n_pre)

    os.makedirs(out_dir, exist_ok=True)
    a_frames = np.stack([frames[r if r >= 0 else -1] for r in a_rows])
    u_frames = np.stack([frames[r] for r in u_rows])
    vio.write_video(os.path.join(out_dir, f"{key}_a.mp4"), a_frames, fps=fps)
    vio.write_video(os.path.join(out_dir, f"{key}_u.mp4"), u_frames, fps=fps)
    plot_loss(loss_file, pre_sampling_rate,
              os.path.join(out_dir, f"{key}_loss.png"), key=key,
              selected_frames=a_idx)
    print(f"adaptive indices: {a_idx}")
    print(f"uniform  indices (presampled timeline): {u_idx}")
    return a_idx, u_idx


if __name__ == "__main__":
    p = argparse.ArgumentParser("adaptive extraction for one video")
    p.add_argument("--video", required=True)
    p.add_argument("--loss_file", required=True)
    p.add_argument("--num_frames", default=16, type=int)
    p.add_argument("--pre_sampling_rate", default=4, type=int)
    p.add_argument("--out_dir", default="extracted")
    p.add_argument("--sharpen", action="store_true")
    a = p.parse_args()
    extract(a.video, a.loss_file, a.num_frames, a.pre_sampling_rate,
            a.out_dir, sharpen=a.sharpen)
