#!/usr/bin/env python
"""Verify that every CSV entry exists on disk
(ref: datasets_custom/preprocessing/verify_file_list.py)."""

import argparse
import os


def main():
    p = argparse.ArgumentParser("verify file list")
    p.add_argument("csv")
    p.add_argument("--prefix", default="")
    p.add_argument("--separator", default=" ")
    a = p.parse_args()

    missing = []
    total = 0
    with open(a.csv) as f:
        for line in f.read().splitlines():
            if not line:
                continue
            total += 1
            path = line.split(a.separator)[0]
            if not os.path.exists(os.path.join(a.prefix, path)):
                missing.append(path)
    print(f"{total} entries, {len(missing)} missing")
    for m in missing[:50]:
        print("missing:", m)


if __name__ == "__main__":
    main()
