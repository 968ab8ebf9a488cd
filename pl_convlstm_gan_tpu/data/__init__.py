from .fenhe import (FenheDataset, read_shapefile_extent, lucc_to_onehot,
                    repair_negative_values, is_leap_year, days_in_year)
from .splits import Subset, split_dataset_by_year, split_dataset_random, year_indices
from .synthetic import SyntheticDownscalingDataset, SyntheticSequenceDataset
from .frames import NpyFramesDataset

# .pipeline is the one module here that imports jax; it is re-exported
# lazily (PEP 562) so numpy-only consumers — the offline ETL tools, which
# run in an analysis environment with no jax installed — can import the
# dataset/calendar helpers above without dragging in the device stack.
_PIPELINE_EXPORTS = ("batch_iterator", "eval_batches", "make_grain_loader",
                     "prefetch_to_device", "put_global_batch")


def __getattr__(name):
    if name in _PIPELINE_EXPORTS:
        from . import pipeline
        return getattr(pipeline, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "FenheDataset", "read_shapefile_extent", "lucc_to_onehot",
    "is_leap_year", "days_in_year",
    "repair_negative_values",
    "Subset", "split_dataset_by_year", "split_dataset_random", "year_indices",
    "SyntheticDownscalingDataset", "SyntheticSequenceDataset",
    "NpyFramesDataset",
    *_PIPELINE_EXPORTS,
]
