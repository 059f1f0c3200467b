#!/usr/bin/env python
"""Build an MSVD test CSV (`filename 0` rows, dummy label) from a clips
directory (ref: MSVD/MSVD_annotations.py:9-19)."""

import argparse
import os


def write_annotations(clips_dir: str, out: str) -> int:
    rows = [f"{f} 0" for f in sorted(os.listdir(clips_dir))
            if f.lower().endswith((".avi", ".mp4", ".mkv", ".webm"))]
    with open(out, "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"{len(rows)} clips -> {out}")
    return len(rows)


def main():
    p = argparse.ArgumentParser("MSVD test.csv builder")
    p.add_argument("clips_dir", help="YouTubeClips directory")
    p.add_argument("--out", default="test.csv")
    a = p.parse_args()
    write_annotations(a.clips_dir, a.out)


if __name__ == "__main__":
    main()
