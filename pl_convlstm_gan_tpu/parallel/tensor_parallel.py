"""Tensor parallelism: channel-sharded ConvLSTM cells over a 'model' mesh axis.

The reference has no TP (SURVEY.md §2.2) and the production models here are small
enough that DP is the right default; this module is the scaling path where hidden
widths outgrow one chip. Design (Megatron column-parallel, expressed TPU-first):

- The cell's conv kernel [K, K, Cin + Ch, 4*Ch] is sharded on the OUTPUT-channel
  axis, with the gate blocks (i|f|o|g) each sharded the same way: shard j holds
  kernel[..., concat(i_j, f_j, o_j, g_j)] — the kernel is stored PERMUTED
  shard-major per-gate, so a plain contiguous ``PartitionSpec(..., 'model')``
  gives every shard complete local gate blocks (no collective between conv and
  gate math). ``shard_cell_params`` / ``unshard_cell_params`` convert.
- (h, c) state is sharded on channels: each shard updates its own slice with
  purely local elementwise math (``ops.convlstm.convlstm_gates_tp`` reads the
  layout via a free reshape).
- The only per-step collective is ONE gather of the (small) h shard, because the
  next conv contracts over the FULL h — riding ICI.

TWO execution routes share this layout:

1. **GSPMD (the trainable path)**: params/opt-state placed with
   ``tp_state_shardings`` over a 2-D (data, model) mesh and the ordinary
   single-program train step jitted with those shardings
   (``train.steps.make_forecaster_train_step(shardings=...)``). XLA's
   partitioner inserts the gather/reduction collectives and differentiates
   them — DP and TP compose in one program with no manual psum plumbing.
2. **shard_map (explicit-collective reference)**: ``make_tp_convlstm_step``
   writes the same math with an explicit ``all_gather`` per step — kept as the
   exact-parity proof of the layout and as the escape hatch if propagation
   ever misbehaves."""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.convlstm import ConvLSTMParams, convlstm_gates
from ..ops.nn import conv2d


def _pergate_permutation(ch: int, n_shards: int) -> np.ndarray:
    """Permutation taking [i|f|o|g] (4*Ch) channel layout to shard-major
    [i_0|f_0|o_0|g_0 | i_1|...] layout (each shard: 4 * Ch/n contiguous)."""
    per = ch // n_shards
    idx = []
    for s in range(n_shards):
        for g in range(4):
            start = g * ch + s * per
            idx.extend(range(start, start + per))
    return np.asarray(idx)


def shard_cell_params(params: ConvLSTMParams, n_shards: int) -> ConvLSTMParams:
    """Reorder a replicated cell kernel/bias into the shard-major per-gate layout
    expected by ``tp_convlstm_step``."""
    ch = params.kernel.shape[-1] // 4
    if ch % n_shards:
        raise ValueError(f"hidden dim {ch} not divisible by {n_shards} shards")
    perm = jnp.asarray(_pergate_permutation(ch, n_shards))
    return ConvLSTMParams(params.kernel[..., perm], params.bias[perm])


def unshard_cell_params(params: ConvLSTMParams, n_shards: int) -> ConvLSTMParams:
    """Inverse of ``shard_cell_params``: shard-major per-gate layout back to the
    canonical [i|f|o|g] layout (checkpoints are stored canonical)."""
    ch = params.kernel.shape[-1] // 4
    if ch % n_shards:
        raise ValueError(f"hidden dim {ch} not divisible by {n_shards} shards")
    inv = jnp.asarray(np.argsort(_pergate_permutation(ch, n_shards)))
    return ConvLSTMParams(params.kernel[..., inv], params.bias[inv])


# --------------------------------------------------------------------------
# pytree-level layout conversion + shardings for the GSPMD trainable path
# --------------------------------------------------------------------------

def _path_keys(path) -> list:
    return [getattr(k, "key", getattr(k, "name", None)) for k in path]


def _is_cell_leaf(path) -> Tuple[bool, str]:
    """(inside a ConvLSTM cell?, leaf name) for a tree path. Works for params
    AND optimizer state (adam mu/nu mirror the param tree under extra prefix
    levels, so the cell_*/kernel suffix is still present)."""
    keys = _path_keys(path)
    in_cell = any(isinstance(k, str) and k.startswith("cell_") for k in keys)
    leaf = keys[-1] if keys else None
    return in_cell, leaf


def tp_permute_tree(tree, n_shards: int, inverse: bool = False):
    """Permute every ConvLSTM-cell kernel/bias leaf in a pytree (params or a
    whole TrainState including adam moments) between the canonical [i|f|o|g]
    gate layout and the shard-major per-gate layout. Shapes are unchanged —
    only the order along the 4*Ch axis. Non-cell leaves pass through."""

    def fix(path, leaf):
        in_cell, name = _is_cell_leaf(path)
        if not in_cell or name not in ("kernel", "bias"):
            return leaf
        ch = leaf.shape[-1] // 4
        if ch % n_shards:
            # fancy indexing with a short permutation would silently
            # TRUNCATE the channel axis; fail like shard_cell_params does
            raise ValueError(
                f"hidden dim {ch} not divisible by {n_shards} shards")
        perm = _pergate_permutation(ch, n_shards)
        if inverse:
            perm = np.argsort(perm)
        return leaf[..., jnp.asarray(perm)]

    return jax.tree_util.tree_map_with_path(fix, tree)


def tp_spec(path, leaf, model_axis: str = "model") -> P:
    """PartitionSpec for one leaf of a TP train state: cell kernels sharded on
    the output-channel axis, cell biases on their only axis, everything else
    (head conv, adam count, step counter) replicated. Batch stays on the
    'data' axis — specs here never mention it, so DP gradient all-reduce is
    inserted by the partitioner."""
    in_cell, name = _is_cell_leaf(path)
    if in_cell and name == "kernel":
        return P(None, None, None, model_axis)
    if in_cell and name == "bias":
        return P(model_axis)
    return P()


def tp_state_shardings(tree, mesh: Mesh, model_axis: str = "model"):
    """NamedSharding pytree for a TrainState/params tree under TP (see
    ``tp_spec``). Pass to jit's in_shardings/out_shardings and to
    ``jax.device_put`` when placing the state."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, tp_spec(p, x, model_axis)), tree)


def make_tp_convlstm_step(mesh: Mesh, axis_name: str = "model"):
    """Returns step(params_sharded, x, h, c) -> (h', c') running channel-TP.

    Shardings: kernel/bias on the last (output-channel) axis; h and c on their
    channel axis; x replicated. The returned function is jit-compiled with those
    shardings and contains exactly one all_gather per call."""

    def shard_body(kernel, bias, x, h_shard, c_shard):
        # full h for the contraction: one all-gather over ICI
        h_full = jax.lax.all_gather(h_shard, axis_name, axis=-1, tiled=True)
        xh = jnp.concatenate([x, h_full], axis=-1)
        z_local = conv2d(xh, kernel, bias, padding="SAME")  # [..., 4*Ch/n]
        return convlstm_gates(z_local, c_shard)             # local gate math

    mapped = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(None, None, None, axis_name), P(axis_name),
                  P(), P(None, None, None, axis_name),
                  P(None, None, None, axis_name)),
        out_specs=(P(None, None, None, axis_name),
                   P(None, None, None, axis_name)),
        check_vma=False)

    def step(params: ConvLSTMParams, x, h, c):
        return mapped(params.kernel, params.bias, x, h, c)

    return jax.jit(step)
