#!/usr/bin/env python
"""Subset a CSV split to n videos per class
(ref: datasets_custom/preprocessing/kinetics_mini.py and
testing/kinetics_test_extract.py)."""

import argparse
from collections import defaultdict


def main():
    p = argparse.ArgumentParser("per-class CSV subset")
    p.add_argument("csv")
    p.add_argument("--out", required=True)
    p.add_argument("--per_class", default=1, type=int)
    p.add_argument("--separator", default=" ")
    a = p.parse_args()

    counts = defaultdict(int)
    kept = []
    with open(a.csv) as f:
        for line in f.read().splitlines():
            if not line:
                continue
            label = line.split(a.separator)[-1]
            if counts[label] < a.per_class:
                counts[label] += 1
                kept.append(line)
    with open(a.out, "w") as f:
        f.write("\n".join(kept) + "\n")
    print(f"kept {len(kept)} rows across {len(counts)} classes -> {a.out}")


if __name__ == "__main__":
    main()
