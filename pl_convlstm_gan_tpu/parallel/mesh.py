"""Device mesh construction and sharding helpers.

The reference is single-process, single-device (``/root/reference/src/training/
trainer.py:20``; SURVEY.md §2.2: no parallelism of any kind). The TPU build scales by
data parallelism over a 1-D ``jax.sharding.Mesh`` (north-star: v5e-16 DP): batches are
sharded on the 'data' axis, parameters/optimizer state replicated, gradients reduced
with ``psum`` over ICI inside ``shard_map`` (see train_parallel.py). Multi-host
bootstrap goes through ``jax.distributed.initialize`` (call ``maybe_init_distributed``
before device queries on multi-host slices)."""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> None:
    """Initialize jax.distributed when launched in a multi-host environment
    (coordinator env vars present) — no-op otherwise.

    The already-initialized check must NOT touch the backend:
    ``jax.process_count()`` would initialize XLA and make the subsequent
    ``jax.distributed.initialize()`` raise unconditionally, bricking every
    multi-host launch. ``jax.distributed.is_initialized()`` only inspects
    client state."""
    if jax.distributed.is_initialized():
        return
    addr = os.environ.get("COORDINATOR_ADDRESS")
    if not addr:
        return
    kwargs = {"coordinator_address": addr}
    # on TPU pods/SLURM jax auto-detects process id/count; for generic hosts
    # (e.g. the CPU multi-process test) pass them explicitly when provided
    if os.environ.get("NUM_PROCESSES") and os.environ.get("PROCESS_ID"):
        kwargs.update(num_processes=int(os.environ["NUM_PROCESSES"]),
                      process_id=int(os.environ["PROCESS_ID"]))
    jax.distributed.initialize(**kwargs)


def make_mesh(data_axis_size: int = 0, axis_name: str = "data",
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over `data_axis_size` devices (0 = all available)."""
    devices = list(devices if devices is not None else jax.devices())
    n = data_axis_size or len(devices)
    if n > len(devices):
        raise ValueError(f"Requested {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def make_mesh_2d(data_axis_size: int = 0, model_axis_size: int = 1,
                 axis_names: Sequence[str] = ("data", "model"),
                 devices: Optional[Sequence] = None) -> Mesh:
    """2-D (data, model) mesh for DP x TP. Model-axis neighbors are adjacent
    device ids (reshape row-major, model minor) so the per-step tensor-parallel
    collectives ride the shortest ICI hops; the data axis only carries one
    gradient all-reduce per step and tolerates longer paths."""
    devices = list(devices if devices is not None else jax.devices())
    m = model_axis_size or 1
    d = data_axis_size or len(devices) // m
    if d * m > len(devices):
        raise ValueError(f"Requested {d}x{m} devices, have {len(devices)}")
    if m < 1 or d < 1:
        raise ValueError(f"Invalid mesh shape {d}x{m}")
    if data_axis_size == 0 and len(devices) % m:
        # defaulted data axis with a non-dividing model axis would silently
        # idle len(devices) - d*m chips for the whole run
        raise ValueError(
            f"model_axis {m} does not divide the {len(devices)} available "
            f"devices — {len(devices) - d * m} would sit idle; set "
            f"mesh.data_axis explicitly to accept that")
    grid = np.asarray(devices[:d * m]).reshape(d, m)
    return Mesh(grid, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host batch with the leading dim sharded over the mesh.

    Station coords/values are identical across batch items in the Fenhe data
    (SURVEY.md §5), but they are still batch-leading arrays here, so a uniform
    leading-dim shard is correct for every element. Multi-host: the input is
    this host's block of the global batch and the global jax.Array is assembled
    across processes (data/pipeline.put_global_batch)."""
    from ..data.pipeline import put_global_batch
    return put_global_batch(batch, batch_sharding(mesh, axis_name))


def replicate(tree, mesh: Mesh):
    # ONE pytree device_put: jax batches the host->device transfers, vs one
    # dispatch per leaf (each ~ms through the axon tunnel) for large trees
    return jax.device_put(tree, replicated_sharding(mesh))
