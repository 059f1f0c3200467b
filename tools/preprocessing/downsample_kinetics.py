#!/usr/bin/env python
"""Kinetics downscale-to-height-256 with resume
(ref: datasets_custom/preprocessing/downsample_kinetics.py).

The reference shells out to ffmpeg per clip
(``scale="trunc(oh*a/2)*2:256"`` — output HEIGHT 256, width
aspect-preserved and rounded to even) and skips files already present in
the output directory so an interrupted run resumes. Same semantics here
on the native decode/encode shim with a process pool (this differs from
resize_videos.py, which scales the SHORT side).

Usage: downsample_kinetics.py <root> --split val  (reads <root>/<split>,
writes <root>/<split>_256), or explicit --src/--dst directories.
"""

import argparse
import os
import sys
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def downscale_one(args):
    src, dst, height = args
    import numpy as np

    from dino_video_summarization_transformer_tpu.data import video as vio
    from dino_video_summarization_transformer_tpu.data.interp import resize

    try:
        frames, fps = vio.read_video(src)
        t, h, w, _ = frames.shape
        # height -> 256, width = aspect-preserved rounded DOWN to even
        # (ffmpeg trunc(oh*a/2)*2)
        new_h = height
        new_w = int(w * height / h) // 2 * 2
        if h == new_h and w % 2 == 0:
            out = frames
        else:
            chw = np.moveaxis(frames.astype(np.float32), -1, 1)
            out = resize(chw, (new_h, new_w), mode="bilinear")
            out = np.clip(np.moveaxis(out, 1, -1), 0, 255).astype(np.uint8)
        vio.write_video(dst, out, fps=fps or 30.0)
        return (src, True, "")
    except Exception as e:
        return (src, False, str(e))


def main():
    p = argparse.ArgumentParser("kinetics height-256 downscale")
    p.add_argument("root", nargs="?", default="")
    p.add_argument("--split", default="val")
    p.add_argument("--src", default="")
    p.add_argument("--dst", default="")
    p.add_argument("--height", default=256, type=int)
    p.add_argument("--workers", default=8, type=int)
    a = p.parse_args()

    src_dir = a.src or os.path.join(a.root, a.split)
    dst_dir = a.dst or os.path.join(a.root, f"{a.split}_{a.height}")
    os.makedirs(dst_dir, exist_ok=True)

    files = sorted(os.listdir(src_dir))
    done = set(os.listdir(dst_dir))  # resume: skip completed outputs
    todo = [f for f in files if f not in done]
    print(f"Starting to downsample {len(todo)} video files "
          f"({len(files) - len(todo)} already done).")

    jobs = [(os.path.join(src_dir, f), os.path.join(dst_dir, f), a.height)
            for f in todo]
    ok = 0
    with ProcessPoolExecutor(max_workers=a.workers) as ex:
        for src, success, err in ex.map(downscale_one, jobs):
            ok += success
            if not success:
                print(f"FAIL {src}: {err}")
    print(f"done: {ok}/{len(jobs)}")


if __name__ == "__main__":
    main()
