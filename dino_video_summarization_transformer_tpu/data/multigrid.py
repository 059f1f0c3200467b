"""Multigrid short-cycle batch scheduling
(ref: datasets_custom/multigrid_helper.py:10-78).

Cycles three batch sizes per the multigrid training recipe (Wu et al. 2019);
the reference's torch BatchSampler becomes a plain index-batch generator
compatible with PrefetchLoader.
"""

from __future__ import annotations

from typing import Iterable, Iterator, List, Sequence, Tuple

import numpy as np


class ShortCycleBatcher:
    """Yields lists of (index, cycle_phase) with cycled batch sizes."""

    def __init__(self, indices: Sequence[int], batch_size: int,
                 drop_last: bool, cfg):
        self.indices = list(indices)
        self.drop_last = drop_last
        bs_factor = [
            int(round((float(cfg.DATA.TRAIN_CROP_SIZE)
                       / (s * cfg.MULTIGRID.DEFAULT_S)) ** 2))
            for s in cfg.MULTIGRID.SHORT_CYCLE_FACTORS
        ]
        self.batch_sizes = [
            batch_size * bs_factor[0],
            batch_size * bs_factor[1],
            batch_size,
        ]

    def __iter__(self) -> Iterator[List[Tuple[int, int]]]:
        counter = 0
        batch_size = self.batch_sizes[0]
        batch: List[Tuple[int, int]] = []
        for idx in self.indices:
            batch.append((idx, counter % 3))
            if len(batch) == batch_size:
                yield batch
                counter += 1
                batch_size = self.batch_sizes[counter % 3]
                batch = []
        if batch and not self.drop_last:
            yield batch

    def __len__(self) -> int:
        avg = sum(self.batch_sizes) / 3.0
        n = len(self.indices)
        return int(np.floor(n / avg)) if self.drop_last else int(np.ceil(n / avg))


def get_random_sampling_rate(long_cycle_sampling_rate: int, sampling_rate: int,
                             rng=None) -> int:
    """(ref: datasets_custom/data_utils.py:328-337)."""
    if long_cycle_sampling_rate > 0:
        assert long_cycle_sampling_rate >= sampling_rate
        rng = rng or np.random
        return int(rng.randint(sampling_rate, long_cycle_sampling_rate + 1))
    return sampling_rate
