"""Small runtime utilities (ref: utils/utils.py misc helpers)."""

from __future__ import annotations

import argparse
import os
import random
import subprocess

import numpy as np


def bool_flag(s: str) -> bool:
    """(ref: utils/utils.py:171-182)."""
    FALSY = {"off", "false", "0"}
    TRUTHY = {"on", "true", "1"}
    if s.lower() in FALSY:
        return False
    if s.lower() in TRUTHY:
        return True
    raise argparse.ArgumentTypeError("invalid value for a boolean flag")


def fix_random_seeds(seed: int = 31) -> None:
    """(ref: utils/utils.py:185-191). JAX randomness is key-based and
    explicit; this pins the host-side numpy/python RNGs used by data
    augmentation and shuffling."""
    np.random.seed(seed)
    random.seed(seed)


def get_sha() -> str:
    """Git SHA stamp for logs (ref: utils/utils.py:373-390)."""
    cwd = os.path.dirname(os.path.abspath(__file__))

    def _run(cmd):
        return subprocess.check_output(cmd, cwd=cwd).decode("ascii").strip()

    sha, diff, branch = "N/A", "clean", "N/A"
    try:
        sha = _run(["git", "rev-parse", "HEAD"])
        subprocess.check_output(["git", "diff"], cwd=cwd)
        diff = _run(["git", "diff-index", "HEAD"])
        diff = "has uncommitted changes" if diff else "clean"
        branch = _run(["git", "rev-parse", "--abbrev-ref", "HEAD"])
    except Exception:
        pass
    return f"sha: {sha}, status: {diff}, branch: {branch}"
