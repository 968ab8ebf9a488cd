"""Functional ConvLSTM cell primitives.

Reference math (``/root/reference/src/models/convlstm.py:16-28``): one conv over
``concat(x, h)`` emitting ``4*hidden`` channels, split into (i, f, o, g) in that order,
then

    c' = sigmoid(f) * c + sigmoid(i) * tanh(g)
    h' = sigmoid(o) * tanh(c')

TPU-first design: the cell is a *pure function* of ``(params, x, h, c)`` so it can be
the body of a ``lax.scan`` over time, and the gate elementwise block is factored out
(``convlstm_gates``) so the Pallas fused kernel (``ops/pallas/convlstm_kernel.py``) and
the XLA path share one definition of the math. Channel layout is NHWC; the gate split
is along the last (lane) axis, which keeps the split a no-copy view on TPU."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from .nn import conv2d


class ConvLSTMParams(NamedTuple):
    """Weights for one cell: kernel [Kh, Kw, Cin+Ch, 4*Ch] (HWIO), bias [4*Ch]."""
    kernel: jnp.ndarray
    bias: jnp.ndarray


def convlstm_gates(z: jnp.ndarray, c: jnp.ndarray):
    """Elementwise gate math. z: [..., 4*Ch] pre-activations (i|f|o|g order), c: [..., Ch].

    Returns (h_next, c_next)."""
    ch = c.shape[-1]
    zi = z[..., 0 * ch:1 * ch]
    zf = z[..., 1 * ch:2 * ch]
    zo = z[..., 2 * ch:3 * ch]
    zg = z[..., 3 * ch:4 * ch]
    i = jax.nn.sigmoid(zi)
    f = jax.nn.sigmoid(zf)
    o = jax.nn.sigmoid(zo)
    g = jnp.tanh(zg)
    c_next = f * c + i * g
    h_next = o * jnp.tanh(c_next)
    return h_next, c_next


def convlstm_step_xla(params: ConvLSTMParams, x: jnp.ndarray, h: jnp.ndarray,
                      c: jnp.ndarray):
    """One ConvLSTM step via XLA conv. x: [B,H,W,Cin], h/c: [B,H,W,Ch]."""
    xh = jnp.concatenate([x, h], axis=-1)
    z = conv2d(xh, params.kernel, params.bias, padding="SAME")
    # selective-remat anchor: with remat_policy="save_z" the scan body saves
    # ONLY this conv pre-activation and recomputes the cheap elementwise gates
    # in the backward — identity op outside any jax.checkpoint context
    z = checkpoint_name(z, "convlstm_z")
    return convlstm_gates(z, c)


def convlstm_step(params: ConvLSTMParams, x: jnp.ndarray, h: jnp.ndarray,
                  c: jnp.ndarray, impl: str = "xla"):
    """Impl-dispatching cell step ('xla' | 'pallas')."""
    if impl == "pallas":
        from .pallas.convlstm_kernel import convlstm_step_pallas
        return convlstm_step_pallas(params, x, h, c)
    return convlstm_step_xla(params, x, h, c)


# --------------------------------------------------------------------------
# tensor-parallel cell: shard-major per-gate kernel layout + GSPMD shardings.
#
# To run the cell channel-sharded over a 'model' mesh axis, the kernel's
# output axis is stored PERMUTED shard-major ([i_0|f_0|o_0|g_0 | i_1|...],
# parallel.tensor_parallel.shard_cell_params): a plain contiguous
# PartitionSpec(..., 'model') on the 4*Ch axis then gives every shard its own
# complete (i, f, o, g) gate blocks for its contiguous slice of the hidden
# channels — the Megatron column-parallel layout, expressed as data layout
# rather than per-device code. The gate math below reads that layout via a
# free reshape, so the WHOLE program stays a single global jit program:
# XLA's partitioner inserts the collectives (gather of h for the conv
# contraction, grad reductions) and differentiates them correctly — no
# manual shard_map/psum plumbing on the training path.
# --------------------------------------------------------------------------

def convlstm_gates_tp(z: jnp.ndarray, c: jnp.ndarray, n_shards: int):
    """Gate math for the shard-major per-gate layout.

    z: [..., 4*Ch] pre-activations laid out [i_0|f_0|o_0|g_0 | i_1|...]
    (shard s holds gates for canonical hidden channels [s*Ch/n:(s+1)*Ch/n]);
    c: [..., Ch] canonical channel order. Returns (h', c') in canonical
    order — the layout is reshape-only, so numerics match ``convlstm_gates``
    on the un-permuted kernel exactly."""
    ch = c.shape[-1]
    chl = ch // n_shards
    zr = z.reshape(*z.shape[:-1], n_shards, 4, chl)
    cr = c.reshape(*c.shape[:-1], n_shards, chl)
    i = jax.nn.sigmoid(zr[..., 0, :])
    f = jax.nn.sigmoid(zr[..., 1, :])
    o = jax.nn.sigmoid(zr[..., 2, :])
    g = jnp.tanh(zr[..., 3, :])
    c_next = f * cr + i * g
    h_next = o * jnp.tanh(c_next)
    return h_next.reshape(c.shape), c_next.reshape(c.shape)


def convlstm_step_tp(params: ConvLSTMParams, x: jnp.ndarray, h: jnp.ndarray,
                     c: jnp.ndarray, n_shards: int, constrain=None):
    """One ConvLSTM step with shard-major per-gate params (see above).

    ``constrain``: optional fn(array) -> array applying the channel-axis
    ``with_sharding_constraint`` (last axis over the 'model' mesh axis) to the
    pre-activations and the new states, anchoring XLA's sharding propagation
    inside the scan body."""
    xh = jnp.concatenate([x, h], axis=-1)
    z = conv2d(xh, params.kernel, params.bias, padding="SAME")
    # selective-remat anchor (same tag as the canonical cell): remat_policy
    # "save_z" must keep working under tensor parallelism
    z = checkpoint_name(z, "convlstm_z")
    if constrain is not None:
        z = constrain(z)
    h_next, c_next = convlstm_gates_tp(z, c, n_shards)
    if constrain is not None:
        h_next, c_next = constrain(h_next), constrain(c_next)
    return h_next, c_next


# --------------------------------------------------------------------------
# split-input cell: conv(concat(x, h)) == conv_x(x) + conv_h(h) by linearity.
# When ALL timestep inputs are known before the recurrence (the Generator's
# encode — reference generator.py:164-171 recomputes the x-side conv inside
# its Python time loop), the x-side contribution for every step can be
# computed as ONE conv over the merged (T*B) batch: bigger contraction for
# the MXU, and the scan body shrinks to the h-side conv + gates.
# --------------------------------------------------------------------------

def convlstm_precompute_x(params: ConvLSTMParams, x: jnp.ndarray, cin_x: int):
    """x-side pre-activations for any batch of inputs. x: [N, H, W, cin_x]
    (N may be T*B merged); returns z_x: [N, H, W, 4*Ch]. Bias is folded in
    here so the in-scan step is bias-free."""
    return conv2d(x, params.kernel[:, :, :cin_x], params.bias, padding="SAME")


def convlstm_step_precomputed(params: ConvLSTMParams, z_x: jnp.ndarray,
                              h: jnp.ndarray, c: jnp.ndarray, cin_x: int):
    """One step given precomputed x-side pre-activations (see above)."""
    z = z_x + conv2d(h, params.kernel[:, :, cin_x:], None, padding="SAME")
    return convlstm_gates(z, c)
