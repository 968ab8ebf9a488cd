"""Dataset splitting: by-year (leakage-free) and seeded-random 70/15/15.

Reference semantics (``/root/reference/src/datasets/fenhe_dataset_split.py:20-106``):
the by-year split computes per-year index ranges with leap-year day counting and drops
the last ``T`` windows of each year so no window crosses a split boundary (note the
reference drops T rather than T-1 windows — we replicate the intent AND the exact
arithmetic so sample counts match; SURVEY.md §5 'latent behaviors')."""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from .fenhe import days_in_year


class Subset:
    """Index view over a map-style dataset (torch.utils.data.Subset equivalent)."""

    def __init__(self, dataset, indices: Sequence[int]):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, i: int):
        return self.dataset[self.indices[i]]


def year_indices(dataset, start_year: int, end_year: int) -> List[int]:
    """Window indices whose start day lies in [start_year, end_year], keeping
    windows inside the year (fenhe_dataset_split.py:33-51)."""
    indices: List[int] = []
    cumulative_days = 0
    for year in range(dataset.start_year, dataset.end_year + 1):
        d = days_in_year(year)
        if start_year <= year <= end_year:
            indices.extend(range(cumulative_days, cumulative_days + d - dataset.T))
        cumulative_days += d
    return indices


def split_dataset_by_year(dataset, train_years: Tuple[int, int],
                          val_years: Tuple[int, int], test_years: Tuple[int, int]):
    train_idx = year_indices(dataset, *train_years)
    val_idx = year_indices(dataset, *val_years)
    test_idx = year_indices(dataset, *test_years)
    print(f"Year split: train {train_years} {len(train_idx)} | "
          f"val {val_years} {len(val_idx)} | test {test_years} {len(test_idx)}")
    return Subset(dataset, train_idx), Subset(dataset, val_idx), Subset(dataset, test_idx)


def split_dataset_random(dataset, train_ratio: float = 0.7, val_ratio: float = 0.15,
                         test_ratio: float = 0.15, seed: int = 42):
    """Seeded permutation split (fenhe_dataset_split.py:70-106)."""
    assert abs(train_ratio + val_ratio + test_ratio - 1.0) < 1e-6
    rng = np.random.RandomState(seed)
    total = len(dataset)
    perm = rng.permutation(total)
    n_train = int(total * train_ratio)
    n_val = int(total * val_ratio)
    print(f"Random split: train {n_train} | val {n_val} | test {total - n_train - n_val}")
    return (Subset(dataset, perm[:n_train].tolist()),
            Subset(dataset, perm[n_train:n_train + n_val].tolist()),
            Subset(dataset, perm[n_train + n_val:].tolist()))
