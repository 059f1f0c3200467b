#!/usr/bin/env python
"""Batch video resizing (ref: datasets_custom/preprocessing/resize_videos.py).

The reference shells out to ffmpeg per file with joblib; here the native
decode/encode shim does the work with a process pool (no ffmpeg CLI in this
image). Short side is scaled to --scale, preserving aspect ratio.
"""

import argparse
import os
import sys
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def resize_one(args):
    src, dst, scale = args
    import numpy as np

    from dino_video_summarization_transformer_tpu.data import video as vio
    from dino_video_summarization_transformer_tpu.data.interp import resize

    try:
        frames, fps = vio.read_video(src)
        t, h, w, _ = frames.shape
        if min(h, w) <= scale:
            new_h, new_w = h, w
        elif h < w:
            new_h, new_w = scale, int(w * scale / h)
        else:
            new_h, new_w = int(h * scale / w), scale
        # even dims for yuv420
        new_h -= new_h % 2
        new_w -= new_w % 2
        chw = np.moveaxis(frames.astype(np.float32), -1, 1)
        out = resize(chw, (new_h, new_w), mode="bilinear")
        out = np.clip(np.moveaxis(out, 1, -1), 0, 255).astype(np.uint8)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        vio.write_video(dst, out, fps=fps or 30.0)
        return (src, True, "")
    except Exception as e:
        return (src, False, str(e))


def main():
    p = argparse.ArgumentParser("batch resize")
    p.add_argument("src_dir")
    p.add_argument("dst_dir")
    p.add_argument("--scale", default=256, type=int)
    p.add_argument("--ext", default="mp4,avi,mkv,webm")
    p.add_argument("--workers", default=8, type=int)
    a = p.parse_args()

    exts = tuple("." + e for e in a.ext.split(","))
    jobs = []
    for root, _, files in os.walk(a.src_dir):
        for f in files:
            if f.lower().endswith(exts):
                src = os.path.join(root, f)
                rel = os.path.relpath(src, a.src_dir)
                jobs.append((src, os.path.join(a.dst_dir, rel), a.scale))
    print(f"{len(jobs)} videos to resize")
    ok = 0
    with ProcessPoolExecutor(max_workers=a.workers) as ex:
        for src, success, err in ex.map(resize_one, jobs):
            ok += success
            if not success:
                print(f"FAIL {src}: {err}")
    print(f"done: {ok}/{len(jobs)}")


if __name__ == "__main__":
    main()
