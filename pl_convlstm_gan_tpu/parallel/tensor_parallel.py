"""Tensor parallelism: channel-sharded ConvLSTM cell under ``shard_map``.

The reference has no TP (SURVEY.md §2.2) and the production models here are small
enough that DP is the right default; this module exists for the scaling path where
hidden widths outgrow one chip. Design:

- The cell's conv kernel [K, K, Cin + Ch, 4*Ch] is sharded on the OUTPUT-channel
  axis, with the gate blocks (i|f|o|g) each sharded the same way: shard j holds
  kernel[..., concat(i_j, f_j, o_j, g_j)] — i.e. the kernel is sharded per-gate so
  the gate split stays local (no collective between conv and gate math).
- (h, c) state is sharded on channels: each shard updates its own h/c slice with
  purely local elementwise math.
- The only collective is ONE all-gather of the (small) h shard per step, needed
  because the next step's conv contracts over the FULL h — the classic
  Megatron-style column-parallel pattern, here riding ICI.

``shard_cell_params`` reorders a standard (replicated) kernel into the per-gate
layout so numerical parity with the single-device cell is exact."""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

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
