"""Persistent XLA compilation cache.

The TPU tunnel in this environment compiles remotely and large programs can
take minutes; caching compiled executables on disk makes repeat CLI/bench
invocations start in seconds. (The reference's cudnn.benchmark=True plays a
loosely analogous autotune-caching role, ref: dino_similarity.py:28.)
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "DVST_COMPILE_CACHE", os.path.expanduser("~/.cache/dvst_xla_cache"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knob
