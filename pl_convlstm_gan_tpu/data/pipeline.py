"""Input pipeline: host-side batching (grain-backed when available) + device prefetch.

Replaces the reference's bare ``torch.utils.data.DataLoader`` with no workers
(``/root/reference/src/training/trainer.py:94-108``) per the north-star: "a grain
pipeline that does decode/normalization/window-stacking on host with device-side
prefetch".

Design:
- ``make_grain_loader`` builds a ``grain.MapDataset`` pipeline over any map-style
  dataset (shuffle -> optional per-host shard -> batch), returning an iterator of
  stacked-numpy batches. Per-host sharding for multi-host DP uses
  ``jax.process_index/count``.
- ``prefetch_to_device`` keeps ``size`` batches in flight: batch i+1 is transferred
  (``jax.device_put``, optionally with a NamedSharding so each DP shard lands on its
  device directly) while batch i computes — hiding H2D behind the step.
- ``batch_iterator`` is the dependency-free fallback with identical semantics.
"""
from __future__ import annotations

import collections
import itertools
from typing import Iterable, Iterator, Optional

import jax
import numpy as np


def _stack(items):
    """Stack a list of example tuples into a tuple of batched arrays."""
    return tuple(np.stack([it[i] for it in items]) for i in range(len(items[0])))


def batch_iterator(dataset, batch_size: int, shuffle: bool = False,
                   seed: int = 0, drop_last: bool = True,
                   epoch: int = 0) -> Iterator:
    """Plain numpy batching over a map-style dataset (one epoch)."""
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed + epoch).shuffle(order)
    end = n - (n % batch_size) if drop_last else n
    for start in range(0, end, batch_size):
        idx = order[start:start + batch_size]
        yield _stack([dataset[int(i)] for i in idx])


def eval_batches(dataset, batch_size: int) -> Iterator:
    """Full-coverage eval batching: yields (batch, n_valid). The final partial
    batch is wrap-padded to the full batch size so shapes stay static (no
    recompile, DP-divisible); consumers weight metrics by n_valid."""
    n = len(dataset)
    for start in range(0, n, batch_size):
        n_valid = min(batch_size, n - start)
        idx = [(start + j) % n for j in range(batch_size)]
        yield _stack([dataset[int(i)] for i in idx]), n_valid


def make_grain_loader(dataset, batch_size: int, shuffle: bool = False, seed: int = 0,
                      num_epochs: Optional[int] = 1, drop_remainder: bool = True,
                      shard_by_process: bool = False,
                      worker_count: int = 0) -> Iterable:
    """grain.MapDataset pipeline: [shard] -> shuffle -> batch -> (workers) iterate."""
    import grain

    ds = grain.MapDataset.source(dataset)
    if shard_by_process and jax.process_count() > 1:
        ds = ds[jax.process_index()::jax.process_count()]
    if shuffle:
        ds = ds.shuffle(seed=seed)
    if num_epochs is not None and num_epochs != 1:
        ds = ds.repeat(num_epochs)
    ds = ds.batch(batch_size, drop_remainder=drop_remainder, batch_fn=_stack)
    if worker_count > 0:
        return ds.to_iter_dataset().mp_prefetch(
            grain.MultiprocessingOptions(num_workers=worker_count))
    return ds


def prefetch_to_device(iterator: Iterable, size: int = 2,
                       sharding=None) -> Iterator:
    """Move batches to device `size` steps ahead of consumption.

    With a `sharding` (e.g. NamedSharding over the data axis), each batch is placed
    directly into its sharded layout — per-device H2D happens once, here, not inside
    the step."""
    queue = collections.deque()
    it = iter(iterator)

    def _put(batch):
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch)
        return jax.tree_util.tree_map(jax.device_put, batch)

    for batch in itertools.islice(it, size):
        queue.append(_put(batch))
    while queue:
        out = queue.popleft()
        nxt = next(it, None)
        if nxt is not None:
            queue.append(_put(nxt))
        yield out
