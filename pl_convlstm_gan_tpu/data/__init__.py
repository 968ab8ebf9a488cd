from .fenhe import (FenheDataset, read_shapefile_extent, lucc_to_onehot,
                    repair_negative_values, is_leap_year, days_in_year)
from .splits import Subset, split_dataset_by_year, split_dataset_random, year_indices
from .synthetic import SyntheticDownscalingDataset, SyntheticSequenceDataset
from .frames import NpyFramesDataset
from .pipeline import (batch_iterator, eval_batches, make_grain_loader,
                       prefetch_to_device, put_global_batch)

__all__ = [
    "FenheDataset", "read_shapefile_extent", "lucc_to_onehot",
    "repair_negative_values", "is_leap_year", "days_in_year",
    "Subset", "split_dataset_by_year", "split_dataset_random", "year_indices",
    "SyntheticDownscalingDataset", "SyntheticSequenceDataset",
    "NpyFramesDataset",
    "batch_iterator", "eval_batches", "make_grain_loader",
    "prefetch_to_device", "put_global_batch",
]
