#!/usr/bin/env python
"""Step through a FrameSelectionDataset interactively
(ref: testing/loader_debug.py:8-42)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dino_video_summarization_transformer_tpu.config import load_config, parse_args
from dino_video_summarization_transformer_tpu.data.datasets import (
    FrameSelectionDataset)


def main():
    p = argparse.ArgumentParser("loader debug")
    p.add_argument("--cfg", dest="cfg_file",
                   default="configs/kinetics/timesformer_divst_8x32_224.yaml")
    p.add_argument("--opts", default=None, nargs="*")
    p.add_argument("--data_path", required=True)
    p.add_argument("--loss_file", required=True)
    p.add_argument("--selection_method", default="adaptive")
    p.add_argument("--num", default=3, type=int)
    p.add_argument("--pdb", action="store_true")
    a = p.parse_args()

    cfg = load_config(a)
    cfg.DATA.PATH_TO_DATA_DIR = a.data_path
    cfg.DATA.PATH_PREFIX = cfg.DATA.PATH_PREFIX or a.data_path
    cfg.LOSS_FILE = a.loss_file
    ds = FrameSelectionDataset(cfg, pre_sampling_rate=4,
                               selection_method=a.selection_method,
                               num_frames=16, return_type="Tensor")
    for i in range(min(a.num, len(ds))):
        frames, label, name, meta = ds[i]
        print(f"[{i}] {name}: frames {frames.shape} {frames.dtype}, label {label}")
        if a.pdb:
            breakpoint()


if __name__ == "__main__":
    main()
