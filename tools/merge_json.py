#!/usr/bin/env python
"""Merge sharded per-frame loss JSONs into one file
(ref: testing/merge_json.py:4-26) — used after multi-shard dino_similarity
runs (--num_shards > 1 writes one JSON per shard)."""

import argparse
import json


def merge_json_files(paths, out_path):
    merged = {}
    for p in paths:
        with open(p, "r") as f:
            merged.update(json.load(f))
    with open(out_path, "w") as f:
        json.dump(merged, f)
    print(f"merged {len(paths)} files -> {out_path} ({len(merged)} videos)")
    return merged


if __name__ == "__main__":
    p = argparse.ArgumentParser("merge loss JSONs")
    p.add_argument("inputs", nargs="+")
    p.add_argument("--out", required=True)
    a = p.parse_args()
    merge_json_files(a.inputs, a.out)
