from .mesh import (
    build_mesh,
    data_sharding,
    init_distributed_mode,
    is_main_process,
    replicated,
)

__all__ = [
    "build_mesh",
    "data_sharding",
    "init_distributed_mode",
    "is_main_process",
    "replicated",
]
