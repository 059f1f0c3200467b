from .mesh import (
    build_mesh,
    data_sharding,
    init_distributed_mode,
    is_main_process,
    replicated,
)
from .pp import build_pipe_mesh, pipeline_apply, pp_forward_features
from .sp import build_seq_mesh, sp_divided_block, sp_forward_features
from .tp import shard_state, tp_sharding_tree, tp_spec_tree
from .zero import zero_shard_state, zero_sharding_tree

__all__ = [
    "build_pipe_mesh",
    "build_seq_mesh",
    "pipeline_apply",
    "pp_forward_features",
    "sp_divided_block",
    "sp_forward_features",
    "build_mesh",
    "data_sharding",
    "init_distributed_mode",
    "is_main_process",
    "replicated",
    "shard_state",
    "tp_sharding_tree",
    "tp_spec_tree",
    "zero_shard_state",
    "zero_sharding_tree",
]
