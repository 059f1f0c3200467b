from . import interp, selection, transform, video, windows
from .datasets import (
    ClipDataset,
    DinoLossDataset,
    FrameSelectionDataset,
    Ssv2Dataset,
    build_dataset,
    read_csv_entries,
)
from .loader import PrefetchLoader, default_collate, shard_indices

__all__ = [
    "interp",
    "selection",
    "transform",
    "video",
    "windows",
    "ClipDataset",
    "DinoLossDataset",
    "FrameSelectionDataset",
    "Ssv2Dataset",
    "build_dataset",
    "read_csv_entries",
    "PrefetchLoader",
    "default_collate",
    "shard_indices",
]
