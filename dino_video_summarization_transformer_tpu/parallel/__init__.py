from .mesh import (
    build_mesh,
    data_sharding,
    init_distributed_mode,
    is_main_process,
    replicated,
)
from .tp import shard_state, tp_sharding_tree, tp_spec_tree

__all__ = [
    "build_mesh",
    "data_sharding",
    "init_distributed_mode",
    "is_main_process",
    "replicated",
    "shard_state",
    "tp_sharding_tree",
    "tp_spec_tree",
]
