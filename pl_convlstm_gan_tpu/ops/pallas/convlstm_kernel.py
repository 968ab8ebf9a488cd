"""Fused ConvLSTM cell step as a Pallas TPU kernel.

What it fuses (vs. the XLA path in ``ops/convlstm.py``): the ``concat(x, h)``, the
KxK 'SAME' conv producing all four gate pre-activations, the sigmoid/tanh gate math,
and the (h, c) state update — one kernel, one pass over VMEM-resident state, no HBM
round-trip for the ``4*hidden``-channel pre-activation tensor. This is the kernel the
north-star names ("single conv producing all four gates plus fused sigmoid/tanh
elementwise updates"); the reference computes the same math as four separate torch
ops (/root/reference/src/models/convlstm.py:16-28).

Kernel strategy
---------------
Grid over the batch. Per batch item:
1. build the zero-padded combined input ``xh`` [(H+pad)x(W+pad)xC] in VMEM scratch
   (two subslice writes implement the concat — no copy of a concatenated tensor);
2. the KxK conv is K*K shifted matmuls on the MXU: for each tap (di, dj), slice the
   HxW window, collapse to (H*W, C), and accumulate ``win @ W[di,dj]`` into an f32
   accumulator — an implicit im2col that never materializes patches;
3. apply the shared gate math (``ops.convlstm.convlstm_gates``) on the accumulator
   and write h', c'.

Row tiling over H keeps the accumulator block small; the padded input is materialized
once per batch item. The wrapper falls back to the XLA path when the estimated VMEM
footprint exceeds the budget (large H*W*C); for multi-step inference at such shapes
the DMA-pipelined (streamed-I/O) rollout kernel applies instead
(ops/pallas/rollout_kernel.py, round 4).

Backward: ``custom_vjp``. The fwd rule re-runs the kernel with the pre-activation
``z`` as an extra output (residual); the bwd pass is cheap elementwise gate algebra
plus two XLA convs (input-grad via mirrored conv, weight-grad via patch correlation)
— XLA's conv gradients are already MXU-optimal, the win is in the forward fusion.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..convlstm import ConvLSTMParams, convlstm_gates

# conservative per-kernel VMEM budget (bytes) for the no-DMA variant
_VMEM_BUDGET = 12 * 1024 * 1024


def _interpret() -> bool:
    """Pallas interpreter mode on non-TPU backends (CPU tests)."""
    return jax.default_backend() != "tpu"


def _kernel_body(x_ref, h_ref, c_ref, w_ref, b_ref, hn_ref, cn_ref, z_ref,
                 xh_scratch, *, k: int, cx: int, ch: int, row_tile: int,
                 save_z: bool):
    hgt, wid = x_ref.shape[1], x_ref.shape[2]
    c_in = cx + ch
    pad = k // 2

    # 1. padded combined input (the fused concat): zero border + two writes
    xh_scratch[...] = jnp.zeros_like(xh_scratch)
    xh_scratch[pad:pad + hgt, pad:pad + wid, 0:cx] = x_ref[0]
    xh_scratch[pad:pad + hgt, pad:pad + wid, cx:c_in] = h_ref[0]

    # 2-3. conv-as-shifted-matmuls + gate fusion, tiled over rows
    n_tiles = hgt // row_tile
    for ti in range(n_tiles):
        r0 = ti * row_tile
        acc = jnp.broadcast_to(b_ref[0].astype(jnp.float32),
                               (row_tile * wid, 4 * ch))
        for tap in range(k * k):
            di, dj = tap // k, tap % k
            win = xh_scratch[di + r0:di + r0 + row_tile, dj:dj + wid, :]
            acc = acc + jnp.dot(win.reshape(row_tile * wid, c_in),
                                w_ref[tap],
                                preferred_element_type=jnp.float32)
        z = acc.reshape(row_tile, wid, 4 * ch)
        if save_z:
            z_ref[0, r0:r0 + row_tile] = z.astype(z_ref.dtype)
        c_cur = c_ref[0, r0:r0 + row_tile].astype(jnp.float32)
        h_next, c_next = convlstm_gates(z, c_cur)
        hn_ref[0, r0:r0 + row_tile] = h_next.astype(hn_ref.dtype)
        cn_ref[0, r0:r0 + row_tile] = c_next.astype(cn_ref.dtype)


def _pick_row_tile(hgt: int) -> int:
    for cand in (16, 8, 4, 2, 1):
        if hgt % cand == 0:
            return cand
    return 1


def _vmem_bytes(hgt, wid, cx, ch, k, row_tile, save_z, itemsize=4):
    c_in = cx + ch
    pad = 2 * (k // 2)
    blocks = (hgt * wid * (cx + 4 * ch)) * itemsize          # x + h, c, hn, cn
    if save_z:
        blocks += hgt * wid * 4 * ch * itemsize
    scratch = (hgt + pad) * (wid + pad) * c_in * itemsize
    acc = row_tile * wid * 4 * ch * 4
    weights = k * k * c_in * 4 * ch * itemsize
    return blocks + scratch + acc + weights


def pallas_step_fits(hgt, wid, cx, ch, k=3, itemsize=4) -> bool:
    # deliberately conservative: requires the save_z=True (training) footprint
    # even for forward-only use, so a shape admitted here can always be
    # differentiated through without outgrowing VMEM mid-training. Costs only
    # an XLA fallback for inference-only shapes in the slack band.
    rt = _pick_row_tile(hgt)
    if _vmem_bytes(hgt, wid, cx, ch, k, rt, save_z=True,
                   itemsize=itemsize) <= _VMEM_BUDGET:
        return True
    return pallas_tiled_fits(hgt, wid, cx, ch, k, itemsize)


@functools.partial(jax.jit, static_argnames=("save_z",))
def _run_kernel(kernel_hwio, bias, x, h, c, save_z: bool):
    b, hgt, wid, cx = x.shape
    ch = h.shape[-1]
    k = kernel_hwio.shape[0]
    c_in = cx + ch
    row_tile = _pick_row_tile(hgt)
    dtype = x.dtype

    w9 = kernel_hwio.reshape(k * k, c_in, 4 * ch)
    b2 = bias.reshape(1, 4 * ch)

    body = functools.partial(_kernel_body, k=k, cx=cx, ch=ch, row_tile=row_tile,
                             save_z=save_z)

    batch_block = lambda c_: pl.BlockSpec((1, hgt, wid, c_),
                                          lambda i: (i, 0, 0, 0),
                                          memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    out_shapes = [jax.ShapeDtypeStruct((b, hgt, wid, ch), dtype),
                  jax.ShapeDtypeStruct((b, hgt, wid, ch), dtype),
                  jax.ShapeDtypeStruct((b, hgt, wid, 4 * ch), dtype)]
    out_specs = [batch_block(ch), batch_block(ch), batch_block(4 * ch)]
    if not save_z:
        out_shapes = out_shapes[:2]
        out_specs = out_specs[:2]

        def body2(x_ref, h_ref, c_ref, w_ref, b_ref, hn_ref, cn_ref, xh_scratch):
            body(x_ref, h_ref, c_ref, w_ref, b_ref, hn_ref, cn_ref, None,
                 xh_scratch)
        kernel_fn = body2
    else:
        kernel_fn = body

    pad = 2 * (k // 2)
    outs = pl.pallas_call(
        kernel_fn,
        grid=(b,),
        in_specs=[batch_block(cx), batch_block(ch), batch_block(ch),
                  full(), full()],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=[pltpu.VMEM((hgt + pad, wid + pad, c_in), dtype)],
        interpret=_interpret(),
    )(x, h, c, w9, b2)
    return outs


# ----------------------------------------------------------------------
# row-tiled variant with manual halo DMA: handles shapes whose full padded
# input does not fit VMEM (e.g. 128x128 x 128ch). Grid is (B, H/TILE); x and h
# stay in HBM (memory_space=ANY) and each grid step DMAs its TILE rows plus
# one halo row above/below into VMEM scratch; c and the outputs ride normal
# row-tile BlockSpecs.
# ----------------------------------------------------------------------

_TILE_H = 16


def _tiled_kernel_body(xh_ref, c_tile, w_ref, b_ref, hn_ref, cn_ref, z_ref,
                       xh_scratch, im2col_scratch, sem, *, cx: int, ch: int,
                       tile_h: int, save_z: bool):
    """xh_ref: [B, H+2, W+2, C_in] pre-padded concat(x, h) living in HBM; each
    grid step DMAs its (tile_h + 2)-row band (halo included, alignment-friendly:
    full width, full channels, row offset a tile multiple).

    The 3x3 conv runs as ONE (tile*W, 9*C_in) @ (9*C_in, 4*Ch) matmul over an
    im2col scratch built from nine lane-aligned window copies — a single long
    contraction instead of nine accumulating K=C_in dots. Measured on v5e at
    128x128x128ch the two formulations are within noise of each other and of
    XLA's conv (~27-29 TFLOP/s): that rate appears to be the pipeline ceiling
    for this shape, not an accumulator-spill artifact."""
    b_i = pl.program_id(0)
    t_i = pl.program_id(1)
    wid = c_tile.shape[1]
    c_in = cx + ch
    r0 = t_i * tile_h

    cp = pltpu.make_async_copy(
        xh_ref.at[b_i, pl.ds(r0, tile_h + 2)], xh_scratch, sem)
    cp.start()
    cp.wait()

    for tap in range(9):
        di, dj = tap // 3, tap % 3
        win = xh_scratch[di:di + tile_h, dj:dj + wid, :]
        im2col_scratch[:, tap * c_in:(tap + 1) * c_in] = \
            win.reshape(tile_h * wid, c_in)
    z = jnp.dot(im2col_scratch[...], w_ref[...],
                preferred_element_type=jnp.float32)
    z = z + b_ref[0].astype(jnp.float32)
    z = z.reshape(tile_h, wid, 4 * ch)
    if save_z:
        z_ref[0] = z.astype(z_ref.dtype)
    h_next, c_next = convlstm_gates(z, c_tile.astype(jnp.float32))
    hn_ref[0] = h_next.astype(hn_ref.dtype)
    cn_ref[0] = c_next.astype(cn_ref.dtype)


def _tiled_vmem_bytes(wid, cx, ch, tile_h, itemsize=4):
    c_in = cx + ch
    # scratch width matches the kernel's DMA band: wid+2 rounded up to the
    # 8-sublane tile (wpad in _run_kernel_tiled), not the raw wid+2
    wpad = -((-(wid + 2)) // 8) * 8
    scratch = (tile_h + 2) * wpad * c_in * itemsize
    im2col = tile_h * wid * 9 * c_in * itemsize
    acc = tile_h * wid * 4 * ch * 4
    z = tile_h * wid * 4 * ch * itemsize
    blocks = tile_h * wid * 3 * ch * itemsize  # c in + hn/cn out
    weights = 9 * c_in * 4 * ch * itemsize
    return scratch + im2col + acc + z + blocks + weights


def _pick_tiled_tile(hgt, wid, cx, ch, itemsize):
    for tile in (16, 8):
        if hgt % tile == 0 and _tiled_vmem_bytes(wid, cx, ch, tile,
                                                 itemsize) <= _VMEM_BUDGET:
            return tile
    return None


def pallas_tiled_fits(hgt, wid, cx, ch, k=3, itemsize=4) -> bool:
    return k == 3 and _pick_tiled_tile(hgt, wid, cx, ch, itemsize) is not None


@functools.partial(jax.jit, static_argnames=("save_z",))
def _run_kernel_tiled(kernel_hwio, bias, x, h, c, save_z: bool):
    b, hgt, wid, cx = x.shape
    ch = h.shape[-1]
    c_in = cx + ch
    dtype = x.dtype
    tile_h = _pick_tiled_tile(hgt, wid, cx, ch, jnp.dtype(dtype).itemsize)
    if tile_h is None:
        # a silent default would write only a subset of output rows (garbage
        # numerics); the dispatcher should never route an unfitting shape here
        raise ValueError(
            f"row-tiled pallas cell has no fitting tile for shape "
            f"H={hgt} W={wid} Cin={cx} Ch={ch} (H must divide by 8 or 16 "
            f"and the band must fit VMEM) — use convlstm_impl 'xla'")

    w9 = kernel_hwio.reshape(9 * c_in, 4 * ch)
    b2 = bias.reshape(1, 4 * ch)
    # the concat + SAME-pad happen once in XLA (bandwidth-bound, fused); the
    # kernel then streams DMA-aligned row bands from HBM. The padded width is
    # rounded up to the 8-sublane tile so DMA slices stay aligned.
    wpad = -((-(wid + 2)) // 8) * 8
    xh = jnp.pad(jnp.concatenate([x, h], axis=-1),
                 ((0, 0), (1, 1), (1, wpad - wid - 1), (0, 0)))

    def kernel_fn(xh_ref, c_ref, w_ref, b_ref, *rest):
        if save_z:
            hn_ref, cn_ref, z_ref, xh_scratch, im2col_scratch, sem = rest
        else:
            hn_ref, cn_ref, xh_scratch, im2col_scratch, sem = rest
            z_ref = None
        # c_ref block is (1, tile, wid, ch); present it as (tile, wid, ch)
        _tiled_kernel_body(xh_ref, c_ref[0], w_ref, b_ref, hn_ref, cn_ref,
                           z_ref, xh_scratch, im2col_scratch, sem, cx=cx,
                           ch=ch, tile_h=tile_h, save_z=save_z)

    row_block = lambda c_: pl.BlockSpec((1, tile_h, wid, c_),
                                        lambda bi, ti: (bi, ti, 0, 0),
                                        memory_space=pltpu.VMEM)

    out_shapes = [jax.ShapeDtypeStruct((b, hgt, wid, ch), dtype),
                  jax.ShapeDtypeStruct((b, hgt, wid, ch), dtype)]
    out_specs = [row_block(ch), row_block(ch)]
    if save_z:
        out_shapes.append(jax.ShapeDtypeStruct((b, hgt, wid, 4 * ch), dtype))
        out_specs.append(row_block(4 * ch))

    outs = pl.pallas_call(
        kernel_fn,
        grid=(b, hgt // tile_h),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),     # xh stays in HBM
                  row_block(ch),                            # c row tile
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=[pltpu.VMEM((tile_h + 2, wpad, c_in), dtype),
                        pltpu.VMEM((tile_h * wid, 9 * c_in), dtype),
                        pltpu.SemaphoreType.DMA(())],
        interpret=_interpret(),
    )(xh, c, w9, b2)
    return outs


def _dispatch(kernel_hwio, bias, x, h, c, save_z: bool):
    """Pick the full-VMEM or row-tiled kernel for the shape."""
    _, hgt, wid, cx = x.shape
    ch = h.shape[-1]
    k = kernel_hwio.shape[0]
    itemsize = jnp.dtype(x.dtype).itemsize
    if _vmem_bytes(hgt, wid, cx, ch, k, _pick_row_tile(hgt),
                   save_z=save_z, itemsize=itemsize) <= _VMEM_BUDGET:
        return _run_kernel(kernel_hwio, bias, x, h, c, save_z)
    return _run_kernel_tiled(kernel_hwio, bias, x, h, c, save_z)


# ----------------------------------------------------------------------
# custom VJP: pallas forward, XLA backward
# ----------------------------------------------------------------------

@jax.custom_vjp
def convlstm_step_pallas_core(kernel_hwio, bias, x, h, c):
    hn, cn = _dispatch(kernel_hwio, bias, x, h, c, save_z=False)
    return hn, cn


def _fwd(kernel_hwio, bias, x, h, c):
    hn, cn, z = _dispatch(kernel_hwio, bias, x, h, c, save_z=True)
    return (hn, cn), (kernel_hwio, bias, x, h, c, z, cn)


def _bwd(res, grads):
    kernel_hwio, bias, x, h, c, z, c_next = res
    dh_next, dc_next = grads
    ch = c.shape[-1]
    k = kernel_hwio.shape[0]

    zf32 = z.astype(jnp.float32)
    i = jax.nn.sigmoid(zf32[..., 0 * ch:1 * ch])
    f = jax.nn.sigmoid(zf32[..., 1 * ch:2 * ch])
    o = jax.nn.sigmoid(zf32[..., 2 * ch:3 * ch])
    g = jnp.tanh(zf32[..., 3 * ch:4 * ch])
    tc = jnp.tanh(c_next.astype(jnp.float32))

    dh = dh_next.astype(jnp.float32)
    dc_tot = dc_next.astype(jnp.float32) + dh * o * (1.0 - tc * tc)
    do = dh * tc
    df = dc_tot * c.astype(jnp.float32)
    dc_prev = dc_tot * f
    di = dc_tot * g
    dg = dc_tot * i

    dz = jnp.concatenate([di * i * (1 - i), df * f * (1 - f),
                          do * o * (1 - o), dg * (1 - g * g)], axis=-1)
    # both backward convs run in f32 (uniform operand dtype even when primal
    # dtypes differ — f32 params with bf16 activations — plus f32
    # accumulation); cotangents cast to each primal's dtype at the edges
    dz = dz.astype(jnp.float32)

    xh = jnp.concatenate([x, h], axis=-1).astype(jnp.float32)
    # input grad: conv with spatially-mirrored kernel, in/out channels swapped
    w_flip = jnp.flip(kernel_hwio, axis=(0, 1)).transpose(0, 1, 3, 2)
    dxh = lax.conv_general_dilated(
        dz, w_flip.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    cx = x.shape[-1]
    dx = dxh[..., :cx].astype(x.dtype)
    dh_prev = dxh[..., cx:].astype(h.dtype)

    # weight grad: correlate input patches with output grads
    dw = lax.conv_general_dilated(
        xh.transpose(3, 1, 2, 0),            # C_in as batch
        dz.transpose(1, 2, 0, 3),            # HWIO with batch as I
        (1, 1), [(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    dw = dw.transpose(1, 2, 0, 3).astype(kernel_hwio.dtype)   # -> HWIO

    db = dz.sum(axis=(0, 1, 2)).astype(bias.dtype)
    return dw, db, dx, dh_prev, dc_prev.astype(c.dtype)


convlstm_step_pallas_core.defvjp(_fwd, _bwd)


def convlstm_step_pallas(params: ConvLSTMParams, x: jnp.ndarray, h: jnp.ndarray,
                         c: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for ``convlstm_step_xla`` (same params/laout). Falls
    back to XLA when the shape exceeds the no-DMA VMEM budget."""
    b, hgt, wid, cx = x.shape
    ch = h.shape[-1]
    k = params.kernel.shape[0]
    if not pallas_step_fits(hgt, wid, cx, ch, k, jnp.dtype(x.dtype).itemsize):
        from ..convlstm import convlstm_step_xla
        return convlstm_step_xla(params, x, h, c)
    return convlstm_step_pallas_core(params.kernel, params.bias, x, h, c)
