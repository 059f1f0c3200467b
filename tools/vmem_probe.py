#!/usr/bin/env python
"""Probe the EFFECTIVE Mosaic scoped-vmem budget of this environment.

The kernels request large budgets (ops/fused_block.py `vmem_limit_bytes`
100/80 MB — v5e has 128 MB of VMEM), but the r4 bench environment's
compile helper was found to clamp scoped vmem to ~16 MB regardless of the
requested limit, silently breaking kernels whose working set fits the
HARDWARE but not the clamp (BENCH.md environment note: the B=4 spatial
backward). This tool measures what actually compiles: a trivial kernel
with an N-MB VMEM scratch, bisected over N.

The measured value feeds fused_block.scoped_vmem_budget(), which the
backward kernels' block choosers consult so block sizes degrade
gracefully instead of failing to compile (VERDICT r4 next-#4).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(lo_mb: int = 2, hi_mb: int = 100) -> int:
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref, scratch):
        scratch[0, :] = x_ref[0, :]
        o_ref[:] = x_ref[:] + scratch[0, 0]

    def compiles(mb: int) -> bool:
        rows = mb * 1024 * 1024 // (128 * 4)
        try:
            f = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=128 * 1024 * 1024),
            )
            jax.jit(f).lower(
                jax.ShapeDtypeStruct((8, 128), jnp.float32)).compile()
            return True
        except Exception as e:  # Mosaic RAM / scoped-vmem errors
            msg = str(e)
            if "vmem" in msg.lower() or "RESOURCE_EXHAUSTED" in msg:
                return False
            raise

    if not compiles(lo_mb):
        return 0
    while hi_mb - lo_mb > 2:
        mid = (lo_mb + hi_mb) // 2
        if compiles(mid):
            lo_mb = mid
        else:
            hi_mb = mid
    return lo_mb


if __name__ == "__main__":
    import jax

    print(f"backend: {jax.default_backend()}")
    mb = probe()
    print(f"effective scoped-vmem budget: ~{mb} MB")
