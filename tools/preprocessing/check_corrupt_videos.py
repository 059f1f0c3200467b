#!/usr/bin/env python
"""Scan a dataset directory for undecodable videos
(ref: datasets_custom/preprocessing/check_corrupt_videos.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from dino_video_summarization_transformer_tpu.data import video as vio


def main():
    p = argparse.ArgumentParser("corrupt video scan")
    p.add_argument("root")
    p.add_argument("--out", default="corrupt_videos.txt")
    a = p.parse_args()

    bad = []
    n = 0
    for root, _, files in os.walk(a.root):
        for f in files:
            if not f.lower().endswith((".mp4", ".avi", ".mkv", ".webm")):
                continue
            n += 1
            path = os.path.join(root, f)
            try:
                frames, _ = vio.read_video(path, max_frames=2)
                if frames.shape[0] == 0:
                    bad.append(path)
            except vio.DecodeError:
                bad.append(path)
    with open(a.out, "w") as f:
        f.write("\n".join(bad))
    print(f"checked {n}, corrupt {len(bad)} -> {a.out}")


if __name__ == "__main__":
    main()
