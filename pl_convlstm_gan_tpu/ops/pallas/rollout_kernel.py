"""Multi-step VMEM-resident ConvLSTM rollout kernel (inference).

The round-2 review identified the one structurally-different Pallas variant the
per-step studies never covered: a forward-only kernel that runs the WHOLE
autoregressive rollout (encode T_in frames, decode T_out frames) for one batch
item inside a single kernel, with every recurrent state pinned in VMEM across
all steps. Rationale: at inference the per-step XLA scan round-trips
(h1, c1, h2, c2) plus the head output through HBM every step and pays the
while-loop step machinery; with ~9 MB of state per batch item at the bench
shape (128x128, 64ch, bf16) everything fits VMEM on a v5e core.

Scope (dispatch falls back to the XLA scan otherwise):
- exactly 2 stacked cells with EQUAL hidden width, 3x3 kernels, 1 channel
  in/out — the production rollout family (bench, nowcast, GAN generator);
- free-running inference only (no teacher forcing, no targets).

Kernel layout (per batch item; grid = (B,)):
- ``xh1[2]``: padded cell-1 input, lanes [0:ch] = h1, lane ch = x, rest zero.
  The cell-1 kernel is repacked to match (h-rows first, then the x row, then
  zero rows to a 2*ch contraction) so the conv is one K=2*ch matmul per tap.
- ``xh2[2]``: padded cell-2 input, lanes [0:ch] = h1 (same step), lanes
  [ch:2ch] = h2 (previous step) — the natural concat layout.
- Double buffering (ping-pong on the leading [2]) keeps each step's reads
  coming from the previous step's writes — the in-place halo hazard of a
  single buffer can't corrupt neighbours.
- ``cbuf``: un-padded packed cell state, lanes [0:ch] = c1, [ch:2ch] = c2,
  updated in place (purely pointwise).
- Convs run as 9 shifted matmuls per row tile on the MXU with f32
  accumulation (implicit im2col, the same strategy as the per-step kernel,
  ops/pallas/convlstm_kernel.py); gate math is the shared
  ``ops.convlstm.convlstm_gates``.
- The time loop runs as a ``fori_loop`` over step PAIRS so the buffer
  ping-pong stays static inside the body; an odd trailing step is unrolled.

Reference semantics: this computes exactly
``ConvLSTMForecaster.apply(params, frames)`` (models/forecaster.py) for the
supported family — parity pinned in tests/test_pallas.py.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..convlstm import convlstm_gates
from .convlstm_kernel import _interpret

# generous cap for the VMEM-resident state; v5e cores have far more VMEM than
# the (8, 128)-tile minimum suggests, and Mosaic fails loudly if exceeded
_VMEM_LIMIT = 110 * 1024 * 1024


def _pick_tile(h: int) -> int:
    for cand in (16, 8, 4, 2, 1):
        if h % cand == 0:
            return cand
    return 1


def _wp(wid: int) -> int:
    """Padded scratch width: (W + 2) rounded up to the 16-sublane tile."""
    return -((-(wid + 2)) // 16) * 16


def _vmem_cost(t_in, t_out, nb, h, w, ch, itemsize, warm=False) -> int:
    lanes = 2 * ch
    wp = _wp(w)
    tile = _pick_tile(h)
    xh = 4 * nb * (h + 2) * wp * lanes * itemsize     # two ping-pong pairs
    cb = nb * h * w * lanes * itemsize
    acc = nb * tile * w * 4 * ch * 4
    wts = 2 * 9 * lanes * 4 * ch * itemsize
    io = nb * (t_in + 2 * t_out) * h * w * itemsize
    if warm:  # the packed (h0, c0) seed inputs also live in VMEM
        io += 2 * nb * h * w * lanes * itemsize
    return xh + cb + acc + wts + io


def _pick_nb(t_in, t_out, b, h, w, ch, itemsize, warm=False) -> int:
    """Batch items per kernel invocation. MEASURED NEGATIVE (round 3): folding
    nb=4 into the matmul M dim at the bench shape multiplies Mosaic's fully-
    unrolled vector code by nb and the kernel compile went from ~2 min to
    >35 min (killed) — while at equal vector-register footprint (smaller row
    tile) batching saves zero ops. nb stays 1; the grid runs batch items
    sequentially, which the measured 28.6% win already includes."""
    if _vmem_cost(t_in, t_out, 1, h, w, ch, itemsize, warm) <= _VMEM_LIMIT:
        return 1
    return 0


def rollout_pallas_fits(t_in: int, t_out: int, b: int, c: int, h: int, w: int,
                        hidden_dims, kernel_size: int, itemsize: int,
                        warm: bool = False) -> bool:
    """Static dispatch check for the supported shape family + VMEM budget."""
    if len(hidden_dims) != 2 or hidden_dims[0] != hidden_dims[1]:
        return False
    ch = hidden_dims[0]
    if c != 1 or kernel_size != 3 or t_in < 1 or t_out < 1:
        return False
    if h % 8 or w % 8 or ch % 8:
        return False
    if (2 * ch) % 128:  # packed (h|x) / (h1|h2) lane layout must tile cleanly
        return False
    return _pick_nb(t_in, t_out, b, h, w, ch, itemsize, warm) >= 1


def _rollout_body(frames_ref, w1_ref, b1_ref, w2_ref, b2_ref, wh_ref, bh_ref,
                  out_ref, xh1_ref, xh2_ref, cbuf_ref, *, t_in: int,
                  t_out: int, ch: int, hgt: int, wid: int, tile: int,
                  nb: int, h0_ref=None, c0_ref=None):
    """``nb`` batch items are processed TOGETHER: the batch folds into the
    matmul M dimension (windows reshape [nb, tile, W, lanes] ->
    [nb*tile*W, lanes]), so per-tile slice/gate overheads amortize over the
    batch and the MXU sees larger contractions. Per-item halos stay correct
    because padding borders are per item in the [nb, H+2, Wp, lanes] slabs."""
    lanes = 2 * ch
    n_tiles = hgt // tile
    steps = t_in + t_out - 1
    m = nb * tile * wid

    # zero-init: borders stay zero forever (writes touch interiors only),
    # which IS the model's zero initial state + SAME-padding. A warm start
    # (streaming forecast branch) seeds the step-0 read slots instead: h1
    # into cell-1's h lanes, h2 into cell-2's previous-step lanes, c1|c2
    # into the packed cell-state buffer — cell 2's h1 lanes are written
    # in-step by cell 1's pass, so they need no seeding.
    xh1_ref[...] = jnp.zeros_like(xh1_ref)
    xh2_ref[...] = jnp.zeros_like(xh2_ref)
    if h0_ref is None:
        cbuf_ref[...] = jnp.zeros_like(cbuf_ref)
    else:
        cbuf_ref[...] = c0_ref[...]
        xh1_ref[0, :, 1:1 + hgt, 1:1 + wid, 0:ch] = h0_ref[..., 0:ch]
        xh2_ref[0, :, 1:1 + hgt, 1:1 + wid, ch:2 * ch] = h0_ref[..., ch:2 * ch]

    def load_frame(t):
        # [nb, H, W] (W on lanes) -> [nb, H, W, 1] (W on sublanes): one
        # relayout per encode step; t is a traced step index. Mosaic supports
        # the minor-dim-inserting reshape only for 32-bit vectors — via f32.
        fr = frames_ref[:, pl.ds(t, 1)].astype(jnp.float32)
        return fr.reshape(nb, hgt, wid, 1)

    def cell_pass(src_ref, dst_ref, dst_lane0, w_ref, b_ref, c_lane0,
                  also_ref=None, also_lane0=0):
        """One full cell update: conv(src) -> gates with c -> h into dst
        (and optionally mirrored into ``also``, for h1 which feeds both
        cell 1's next step and cell 2's current step)."""
        for ti in range(n_tiles):
            r0 = ti * tile
            acc = jnp.broadcast_to(b_ref[0].astype(jnp.float32),
                                   (m, 4 * ch))
            for tap in range(9):
                di, dj = tap // 3, tap % 3
                win = src_ref[:, r0 + di:r0 + di + tile, dj:dj + wid, :]
                acc = acc + jnp.dot(win.reshape(m, lanes),
                                    w_ref[tap],
                                    preferred_element_type=jnp.float32)
            z = acc.reshape(nb, tile, wid, 4 * ch)
            c_cur = cbuf_ref[:, r0:r0 + tile, :, c_lane0:c_lane0 + ch]
            h_new, c_new = convlstm_gates(z, c_cur.astype(jnp.float32))
            h_new = h_new.astype(xh1_ref.dtype)
            cbuf_ref[:, r0:r0 + tile, :, c_lane0:c_lane0 + ch] = \
                c_new.astype(cbuf_ref.dtype)
            dst_ref[:, r0 + 1:r0 + 1 + tile, 1:1 + wid,
                    dst_lane0:dst_lane0 + ch] = h_new
            if also_ref is not None:
                also_ref[:, r0 + 1:r0 + 1 + tile, 1:1 + wid,
                         also_lane0:also_lane0 + ch] = h_new

    def head_pass(src_ref, t, x_dst_ref):
        """3x3 head conv over h2 (lanes [ch:2ch] of src) -> prediction;
        written to the output frame t_out slot and, for the autoregressive
        feed, into lane ch of the next step's cell-1 input."""
        t_o = t - (t_in - 1)
        for ti in range(n_tiles):
            r0 = ti * tile
            acc = jnp.broadcast_to(bh_ref[0].astype(jnp.float32), (m, 1))
            for tap in range(9):
                di, dj = tap // 3, tap % 3
                win = src_ref[:, r0 + di:r0 + di + tile, dj:dj + wid,
                              ch:ch + ch]
                acc = acc + jnp.dot(win.reshape(m, ch),
                                    wh_ref[tap],
                                    preferred_element_type=jnp.float32)
            # minor-dim reshapes must stay in f32 (Mosaic); cast at the writes
            o3 = acc.reshape(nb, tile, wid, 1)
            x_dst_ref[:, r0 + 1:r0 + 1 + tile, 1:1 + wid, ch:ch + 1] = \
                o3.astype(xh1_ref.dtype)
            # [nb, tile, W, 1] -> [nb, 1, tile, W] (W back onto lanes) for
            # the result; t_o is a traced output-frame index
            out_ref[:, pl.ds(t_o, 1), r0:r0 + tile, :] = \
                o3.reshape(nb, 1, tile, wid).astype(out_ref.dtype)

    def one_step(t, cur: int):
        """Step t: buffers read from slot ``cur``, write to ``1 - cur``.
        ``cur`` is a static python int (the loop runs over step pairs)."""
        nxt = 1 - cur
        src1, dst1 = xh1_ref.at[cur], xh1_ref.at[nxt]
        src2, dst2 = xh2_ref.at[cur], xh2_ref.at[nxt]

        # encode phase: overwrite the x lane with the observed frame
        @pl.when(t < t_in)
        def _():
            fr = load_frame(t).astype(xh1_ref.dtype)
            src1[:, 1:1 + hgt, 1:1 + wid, ch:ch + 1] = fr

        # cell 1: h1_new -> next cell-1 buffer (lanes 0:ch) AND the CURRENT
        # cell-2 buffer (lanes 0:ch) — cell 2 consumes this step's h1
        cell_pass(src1, dst1, 0, w1_ref, b1_ref, 0,
                  also_ref=src2, also_lane0=0)
        # cell 2: reads (h1_new | h2_old) from src2, h2_new -> next buffer
        cell_pass(src2, dst2, ch, w2_ref, b2_ref, ch)

        # head (only once predictions start): prediction t_out slot + the
        # autoregressive x for step t+1
        @pl.when(t >= t_in - 1)
        def _():
            head_pass(dst2, t, dst1)

    def pair_body(i, _):
        one_step(2 * i, 0)
        one_step(2 * i + 1, 1)
        return 0

    jax.lax.fori_loop(0, steps // 2, pair_body, 0)
    if steps % 2:
        one_step(steps - 1, (steps - 1) % 2)


def _rollout_body_warm(frames_ref, h0_ref, c0_ref, w1_ref, b1_ref, w2_ref,
                       b2_ref, wh_ref, bh_ref, out_ref, xh1_ref, xh2_ref,
                       cbuf_ref, **kw):
    """Positional-ref adapter: pallas_call passes input refs in in_specs
    order, so the warm variant's extra (h0, c0) inputs land here and are
    forwarded to the shared body as keywords."""
    _rollout_body(frames_ref, w1_ref, b1_ref, w2_ref, b2_ref, wh_ref, bh_ref,
                  out_ref, xh1_ref, xh2_ref, cbuf_ref,
                  h0_ref=h0_ref, c0_ref=c0_ref, **kw)


def _launch_rollout(packed, frames, h0, c0, t_out: int, interpret=None):
    """Shared pallas_call scaffolding for the cold (h0/c0 None) and warm
    variants — one place owns block specs, scratch shapes, and VMEM policy.

    ``interpret``: None = auto (interpreter on non-TPU backends); an explicit
    bool overrides — cross-platform ``jax.export`` lowering for TPU from a
    CPU-only host must pass False or the artifact silently captures the
    interpreter emulation instead of the Mosaic kernel."""
    w1p, b1, w2p, b2, whp, bh = packed
    b, t_in, hgt, wid = frames.shape
    ch = w2p.shape[1] // 2
    dtype = frames.dtype
    tile = _pick_tile(hgt)
    warm = h0 is not None
    nb = _pick_nb(t_in, t_out, b, hgt, wid, ch, jnp.dtype(dtype).itemsize,
                  warm)
    if nb < 1:
        raise ValueError("rollout kernel VMEM budget exceeded — dispatch bug")

    body_fn = _rollout_body_warm if warm else _rollout_body
    body = functools.partial(body_fn, t_in=t_in, t_out=t_out, ch=ch,
                             hgt=hgt, wid=wid, tile=tile, nb=nb)
    lanes = 2 * ch
    grid_block = lambda n: pl.BlockSpec((nb, n, hgt, wid),
                                        lambda i: (i, 0, 0, 0),
                                        memory_space=pltpu.VMEM)
    state_block = lambda: pl.BlockSpec((nb, hgt, wid, lanes),
                                       lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = ([grid_block(t_in)]
                + ([state_block(), state_block()] if warm else [])
                + [full()] * 6)
    args = (frames,) + ((h0, c0) if warm else ()) + packed

    return pl.pallas_call(
        body,
        grid=(b // nb,),
        in_specs=in_specs,
        out_specs=grid_block(t_out),
        out_shape=jax.ShapeDtypeStruct((b, t_out, hgt, wid), dtype),
        scratch_shapes=[
            # padded width rounded up to the 16-sublane tile: the per-step
            # .at[slot] sub-ref slice requires tiling-aligned sublane extents
            pltpu.VMEM((2, nb, hgt + 2, _wp(wid), lanes), dtype),  # xh1 a/b
            pltpu.VMEM((2, nb, hgt + 2, _wp(wid), lanes), dtype),  # xh2 a/b
            pltpu.VMEM((nb, hgt, wid, lanes), dtype),              # c1|c2
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret() if interpret is None else interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("t_out", "interpret"))
def _run_rollout(w1p, b1, w2p, b2, whp, bh, frames, t_out: int,
                 interpret=None):
    """frames: [B, T_in, H, W] (channel squeezed); returns [B, t_out, H, W]."""
    return _launch_rollout((w1p, b1, w2p, b2, whp, bh), frames, None, None,
                           t_out, interpret)


@functools.partial(jax.jit, static_argnames=("t_out", "interpret"))
def _run_rollout_warm(w1p, b1, w2p, b2, whp, bh, frames, h0, c0, t_out: int,
                      interpret=None):
    """Decode-only rollout from a warm recurrent state.

    frames: [B, 1, H, W] — the autoregressive seed (the stream's last emitted
    frame); h0/c0: [B, H, W, 2*ch] packed (cell1 | cell2) hidden/cell state.
    Runs t_in=1 so step 0 consumes the seed frame against the warm state and
    the head emits from step 0 — exactly horizon=t_out free-running steps."""
    return _launch_rollout((w1p, b1, w2p, b2, whp, bh), frames, h0, c0, t_out,
                           interpret)


def _pack_weights(cell1, cell2, head_kernel, head_bias, ch: int, dtype):
    """Repack canonical forecaster params for the kernel's lane layout.

    cell-1 kernel [3,3,1+ch,4ch] contracts (h1 | x | zeros) lanes: rows
    reordered h-first, x row at lane ch, zero rows to 2*ch. cell-2 kernel
    [3,3,2ch,4ch] already matches (h1 | h2). Head [3,3,ch,1] -> [9, ch, 1]."""
    k1 = cell1.kernel.astype(dtype)
    w1p = jnp.zeros((9, 2 * ch, 4 * ch), dtype)
    w1p = w1p.at[:, 0:ch].set(k1[:, :, 1:1 + ch].reshape(9, ch, 4 * ch))
    w1p = w1p.at[:, ch].set(k1[:, :, 0].reshape(9, 4 * ch))
    w2p = cell2.kernel.astype(dtype).reshape(9, 2 * ch, 4 * ch)
    whp = head_kernel.astype(dtype).reshape(9, ch, 1)
    return (w1p, cell1.bias.astype(dtype).reshape(1, 4 * ch),
            w2p, cell2.bias.astype(dtype).reshape(1, 4 * ch),
            whp, head_bias.astype(dtype).reshape(1, 1))


def rollout_pallas(params, frames, t_out: int,
                   compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Free-running rollout via the VMEM-resident kernel.

    ``params``: a ConvLSTMForecaster param pytree (2 equal-width cells + head,
    models/forecaster.py); ``frames``: [B, T_in, 1, H, W] (NCHW like the
    model); returns [B, t_out, 1, H, W] float32 — same contract as
    ``model.apply(params, frames)`` at inference."""
    from ..convlstm import ConvLSTMParams

    core = params["params"]["core"]
    cell1 = ConvLSTMParams(core["cell_0"]["kernel"], core["cell_0"]["bias"])
    cell2 = ConvLSTMParams(core["cell_1"]["kernel"], core["cell_1"]["bias"])
    ch = cell1.kernel.shape[-1] // 4
    b, t_in, c, hgt, wid = frames.shape
    assert c == 1, "rollout kernel supports 1-channel frames"

    packed = _pack_weights(cell1, cell2, core["head"]["kernel"],
                           core["head"]["bias"], ch, compute_dtype)
    fr = frames[:, :, 0].astype(compute_dtype)          # [B, T_in, H, W]
    out = _run_rollout(*packed, fr, t_out)
    return out[:, :, None].astype(jnp.float32)          # [B, t_out, 1, H, W]


def rollout_pallas_from_state(params, cells, prev_out, horizon: int,
                              compute_dtype=jnp.bfloat16,
                              interpret=None) -> jnp.ndarray:
    """Free-running rollout branched from a WARM recurrent state.

    The streaming counterpart of ``rollout_pallas``: instead of encoding an
    input window from zeros, the kernel's VMEM state buffers are seeded from
    the carried stream state and every step is a decode step.

    ``params``: ConvLSTMForecaster pytree (2 equal-width cells + head);
    ``cells``: ``((h1, c1), (h2, c2))`` NHWC ``[B, H, W, ch]`` each;
    ``prev_out``: ``[B, H, W, C]`` — the stream's last emitted frame (the
    autoregressive input for the first step). Returns ``[B, horizon, 1, H, W]``
    float32 — same contract as ``StreamingForecaster._forecast_scan``
    (streaming.py), parity pinned in tests/test_pallas.py."""
    from ..convlstm import ConvLSTMParams

    core = params["params"]["core"]
    cell1 = ConvLSTMParams(core["cell_0"]["kernel"], core["cell_0"]["bias"])
    cell2 = ConvLSTMParams(core["cell_1"]["kernel"], core["cell_1"]["bias"])
    ch = cell1.kernel.shape[-1] // 4
    assert prev_out.shape[-1] == 1, "rollout kernel supports 1-channel frames"

    packed = _pack_weights(cell1, cell2, core["head"]["kernel"],
                           core["head"]["bias"], ch, compute_dtype)
    h0 = jnp.concatenate([cells[0][0], cells[1][0]], -1).astype(compute_dtype)
    c0 = jnp.concatenate([cells[0][1], cells[1][1]], -1).astype(compute_dtype)
    fr = jnp.transpose(prev_out, (0, 3, 1, 2)).astype(compute_dtype)
    out = _run_rollout_warm(*packed, fr, h0, c0, horizon, interpret)
    return out[:, :, None].astype(jnp.float32)          # [B, horizon, 1, H, W]
