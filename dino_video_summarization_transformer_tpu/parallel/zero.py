"""ZeRO-1-style optimizer-state sharding over the data axis.

The reference ships (unused) DeepSpeed ZeRO-2/3 configs in its vendored
LLaVA tree and nothing for its own trainer (SURVEY.md section 2.4). The
TPU-native equivalent of ZeRO stage 1 is pure sharding annotations under
GSPMD: the Adam moments (the largest per-chip state after the params
themselves — 2x params in f32) are sharded over the ``data`` axis while
params stay replicated; XLA partitions the elementwise moment updates and
inserts the all-gather that re-replicates the parameter update. No manual
collectives, no optimizer rewrite — the same ``make_train_step`` consumes
the tree via its ``state_sharding`` argument.

Memory per chip for ViT-B + the 65k DINO head (f32 moments, 8-way data
axis): ~0.8 GB of moments -> ~0.1 GB. Step values are unchanged
(tests/test_sharding.py::test_zero1_sharded_step_matches_single_device).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _moment_sharding(leaf, mesh: Mesh, axis: str) -> NamedSharding:
    """Shard the first dim divisible by the axis size; replicate scalars
    and indivisible leaves (optax counts, odd-shaped biases)."""
    size = mesh.shape[axis]
    shape = getattr(leaf, "shape", ())
    for d, s in enumerate(shape):
        if s >= size and s % size == 0:
            spec = [None] * len(shape)
            spec[d] = axis
            return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def zero_sharding_tree(state: Any, mesh: Mesh, axis: str = "data") -> Any:
    """NamedSharding pytree for a TrainState: ``opt_state`` leaves sharded
    over ``axis`` (ZeRO-1), everything else replicated. Feed to
    make_train_step(state_sharding=...) and jax.device_put."""
    repl = NamedSharding(mesh, P())

    def build(field_name, sub):
        if field_name == "opt_state":
            return jax.tree.map(lambda l: _moment_sharding(l, mesh, axis),
                                sub)
        return jax.tree.map(lambda _: repl, sub)

    fields = getattr(state, "_fields", None)
    assert fields is not None, "expected a NamedTuple TrainState"
    return type(state)(**{f: build(f, getattr(state, f)) for f in fields})


def zero_shard_state(state: Any, mesh: Mesh, axis: str = "data") -> Any:
    """device_put a TrainState with ZeRO-1 shardings."""
    return jax.device_put(state, zero_sharding_tree(state, mesh, axis))
