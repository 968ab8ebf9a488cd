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


def _process_slice(idx, process_index: Optional[int], process_count: Optional[int]):
    """This host's contiguous block of a global batch's index list.

    Block (not interleaved) slicing matches the global array layout produced by
    ``jax.make_array_from_process_local_data`` over a mesh built from
    ``jax.devices()``, whose order groups each process's local devices
    contiguously — host p owns global rows [p*local : (p+1)*local]."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if pc == 1:
        return idx
    local = len(idx) // pc
    assert local * pc == len(idx), \
        f"global batch {len(idx)} not divisible by {pc} processes"
    return idx[pi * local:(pi + 1) * local]


def batch_iterator(dataset, batch_size: int, shuffle: bool = False,
                   seed: int = 0, drop_last: bool = True, epoch: int = 0,
                   process_index: Optional[int] = None,
                   process_count: Optional[int] = None) -> Iterator:
    """Numpy batching over a map-style dataset (one epoch).

    `batch_size` is the GLOBAL batch size. Under multi-host DP every host draws
    the same seeded global permutation and yields only its own per-host block of
    each global batch (disjoint + complete across hosts by construction);
    ``prefetch_to_device`` then assembles the global sharded array. Single
    process: the block is the whole batch."""
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed + epoch).shuffle(order)
    end = n - (n % batch_size) if drop_last else n
    for start in range(0, end, batch_size):
        idx = _process_slice(order[start:start + batch_size],
                             process_index, process_count)
        yield _stack([dataset[int(i)] for i in idx])


def eval_batches(dataset, batch_size: int,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None) -> Iterator:
    """Full-coverage eval batching: yields (batch, n_valid). The final partial
    batch is wrap-padded to the full (global) batch size so shapes stay static
    (no recompile, DP-divisible); eval steps mask rows with global index >=
    n_valid. Under multi-host DP each host yields its block of every global
    batch (same batch count on all hosts; n_valid is the GLOBAL count, matching
    the global row indices after assembly)."""
    n = len(dataset)
    for start in range(0, n, batch_size):
        n_valid = min(batch_size, n - start)
        idx = _process_slice([(start + j) % n for j in range(batch_size)],
                             process_index, process_count)
        yield _stack([dataset[int(i)] for i in idx]), n_valid


def make_grain_loader(dataset, batch_size: int, shuffle: bool = False, seed: int = 0,
                      num_epochs: Optional[int] = 1, drop_remainder: bool = True,
                      shard_by_process: bool = True,
                      worker_count: int = 0,
                      process_index: Optional[int] = None,
                      process_count: Optional[int] = None) -> Iterable:
    """grain.MapDataset pipeline: [shard] -> shuffle -> batch -> (workers) iterate.

    `batch_size` is the GLOBAL batch size; under multi-host DP each host's
    pipeline reads a disjoint interleaved shard of the dataset and emits its
    per-host slice (batch_size / process_count items) of every global batch —
    ``prefetch_to_device`` assembles the global sharded array.

    ``num_epochs``: 1 (default) = one pass; None = endless stream (grain's
    ``repeat(None)`` convention) for step-count-driven loops."""
    import grain

    pi = jax.process_index() if process_index is None else process_index
    pc_total = jax.process_count() if process_count is None else process_count

    ds = grain.MapDataset.source(dataset)
    local_bs = batch_size
    common = None
    if shard_by_process and pc_total > 1:
        pc = pc_total
        assert batch_size % pc == 0, (batch_size, pc)
        ds = ds[pi::pc]
        local_bs = batch_size // pc
        # interleaved shards differ in length by up to 1 when n % pc != 0;
        # truncate every host to the SAME length (a multiple of local_bs) so
        # all hosts yield the same number of batches per epoch — otherwise one
        # host would enter an extra global step and the distributed program
        # would deadlock on mismatched collectives. Truncation happens AFTER
        # the shuffle so the dropped tail varies per epoch seed.
        n = len(dataset)
        common = (n // pc // local_bs) * local_bs if drop_remainder else n // pc
    if shuffle:
        ds = ds.shuffle(seed=seed)
    if common is not None:
        ds = ds[:common]
    # grain convention: repeat(None) = endless stream; 1 = single pass
    if num_epochs is None or num_epochs != 1:
        ds = ds.repeat(num_epochs)
    ds = ds.batch(local_bs, drop_remainder=drop_remainder, batch_fn=_stack)
    if worker_count > 0:
        return ds.to_iter_dataset().mp_prefetch(
            grain.MultiprocessingOptions(num_workers=worker_count))
    return ds


def put_global_batch(batch, sharding):
    """Place a (per-host local) batch as a globally-sharded on-device array.

    Single-process: a plain ``device_put`` with the NamedSharding (input is the
    full global batch). Multi-host: each host holds only its block of the global
    batch, and ``jax.make_array_from_process_local_data`` assembles the global
    jax.Array across processes — the per-host input feed the reference lacks
    entirely (SURVEY.md §2.2 'per-host data sharding')."""
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def prefetch_to_device(iterator: Iterable, size: int = 2,
                       sharding=None) -> Iterator:
    """Move batches to device `size` steps ahead of consumption.

    With a `sharding` (e.g. NamedSharding over the data axis), each batch is placed
    directly into its sharded layout — per-device H2D happens once, here, not inside
    the step. Under multi-host DP the local batch becomes this host's shard of the
    global array (see put_global_batch)."""
    queue = collections.deque()
    it = iter(iterator)

    def _put(batch):
        if sharding is not None:
            return put_global_batch(batch, sharding)
        return jax.tree_util.tree_map(jax.device_put, batch)

    for batch in itertools.islice(it, size):
        queue.append(_put(batch))
    while queue:
        out = queue.popleft()
        nxt = next(it, None)
        if nxt is not None:
            queue.append(_put(nxt))
        yield out
