"""Device mesh and sharding helpers.

Replaces the reference's process-group bootstrap
(ref: utils/utils.py:437-469: env/SLURM detection + NCCL init) with a JAX
mesh: data parallelism is batch-dim sharding under jit; the reference's
explicit collectives (gradient all-reduce via DDP, centering all_reduce,
kNN all_gather — SURVEY.md section 2.4) become XLA-inserted collectives
over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence] = None,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    """Mesh with a data axis and an (optional, default trivial) model axis.

    data=-1 uses all remaining devices. The reference supports only DP
    (SURVEY.md section 2.4); the model axis exists so tensor-parallel
    shardings can be layered on without re-plumbing callers.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (data_axis, model_axis))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 over the data axis (batch sharding)."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_distributed_mode() -> dict:
    """Multi-host bootstrap (ref: utils/utils.py:437-469).

    Single-host is a no-op; multi-host initializes jax.distributed from the
    standard env (COORDINATOR_ADDRESS etc. under TPU pods this is automatic).
    Returns rank/world info for logging parity with the reference.
    """
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
            "MEGASCALE_COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()
        except Exception as e:  # already initialized / single-process
            print(f"jax.distributed.initialize skipped: {e}")
    return {
        "rank": jax.process_index(),
        "world_size": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def is_main_process() -> bool:
    """(ref: utils/utils.py:414-419)."""
    return jax.process_index() == 0
