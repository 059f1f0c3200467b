"""CLI argument parsing shims (ref: utils/parser.py:11-90).

``parse_args`` mirrors the SlowFast-style launcher arguments; ``load_config``
builds the config tree from defaults + YAML + trailing ``opts`` overrides.
"""

from __future__ import annotations

import argparse
import sys

from .defaults import get_cfg


def parse_args(argv=None):
    """Reference-compatible launcher args (ref: utils/parser.py:11-62)."""
    parser = argparse.ArgumentParser(
        description="TPU video summarization training/eval pipeline."
    )
    parser.add_argument(
        "--shard_id", default=0, type=int,
        help="Shard id of the current machine (multi-slice DCN).",
    )
    parser.add_argument(
        "--num_shards", default=1, type=int,
        help="Number of machine shards.",
    )
    parser.add_argument(
        "--init_method", default="tcp://localhost:9999", type=str,
        help="Kept for CLI parity; TPU runtime uses jax.distributed.",
    )
    parser.add_argument(
        "--cfg", dest="cfg_file", type=str, default=None,
        help="Path to the config yaml file.",
    )
    parser.add_argument(
        "opts", default=None, nargs=argparse.REMAINDER,
        help="KEY VALUE override pairs applied after the YAML merge.",
    )
    if argv is None and len(sys.argv) == 1:
        parser.print_help()
    return parser.parse_args(argv)


def load_config(args):
    """Defaults -> YAML -> opts merge (ref: utils/parser.py:65-90)."""
    cfg = get_cfg()
    cfg_file = getattr(args, "cfg_file", None)
    if cfg_file is not None:
        cfg.merge_from_file(cfg_file)
    opts = getattr(args, "opts", None)
    if opts:
        cfg.merge_from_list(list(opts))
    if hasattr(args, "num_shards") and hasattr(args, "shard_id"):
        cfg.NUM_SHARDS = args.num_shards
        cfg.SHARD_ID = args.shard_id
    if hasattr(args, "rng_seed"):
        cfg.RNG_SEED = args.rng_seed
    if hasattr(args, "output_dir"):
        cfg.OUTPUT_DIR = args.output_dir
    return cfg
