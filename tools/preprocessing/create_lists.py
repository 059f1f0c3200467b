#!/usr/bin/env python
"""Generate `path label` CSV split files from a class-per-directory layout
(ref: datasets_custom/preprocessing/create_lists.py)."""

import argparse
import os


def main():
    p = argparse.ArgumentParser("dataset CSV generation")
    p.add_argument("root", help="directory with one subdir per class")
    p.add_argument("--out", required=True)
    p.add_argument("--separator", default=" ")
    p.add_argument("--relative_to", default=None)
    a = p.parse_args()

    classes = sorted(d for d in os.listdir(a.root)
                     if os.path.isdir(os.path.join(a.root, d)))
    rows = []
    for label, cls in enumerate(classes):
        for f in sorted(os.listdir(os.path.join(a.root, cls))):
            path = os.path.join(a.root, cls, f)
            if a.relative_to:
                path = os.path.relpath(path, a.relative_to)
            rows.append(f"{path}{a.separator}{label}")
    with open(a.out, "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"{len(rows)} rows, {len(classes)} classes -> {a.out}")


if __name__ == "__main__":
    main()
