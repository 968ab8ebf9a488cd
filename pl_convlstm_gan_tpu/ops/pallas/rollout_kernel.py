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
- 2 OR 3 stacked cells with EQUAL hidden width, 3x3 kernels, 1 channel
  in/out — the production rollout family (bench + GAN generator are 2-cell;
  the flagship nowcast_128 forecaster is 3-cell);
- free-running inference only (no teacher forcing, no targets).

Kernel layout (per batch item; grid = (B,)):
- ``xh1[2]``: padded cell-1 input, lanes [0:ch] = h1, lane ch = x, rest zero.
  The cell-1 kernel is repacked to match (h-rows first, then the x row, then
  zero rows to a 2*ch contraction) so the conv is one K=2*ch matmul per tap.
- ``xh2[2]``: padded cell-2 input, lanes [0:ch] = h1 (same step), lanes
  [ch:2ch] = h2 (previous step) — the natural concat layout. A 3rd cell adds
  ``xh3[2]`` with the same (h2 | h3) layout and a second cell-state buffer.
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

Two I/O variants share the body (``pick_io_mode`` chooses per shape):
- **resident** (default where it fits): frames and the whole output live in
  VMEM as pipelined blocks — the round-3 variant, measured -28.6% vs the XLA
  scan at the bench shape;
- **streamed** (round 4): frames/outputs (and warm seeds) stay HBM-resident;
  per-step frames arrive and predictions depart through double-buffered
  ``make_async_copy`` DMAs overlapping the cell compute, and warm seeds stage
  through one VMEM buffer. I/O then costs ~4 frame-slots of VMEM instead of
  t_in + 2*t_out frames + 2 seed blocks — which is what admits the
  256x256/30-frame serving family (config #5 shapes) that the resident
  warm-start budget cannot fit.

Reference semantics: this computes exactly
``ConvLSTMForecaster.apply(params, frames)`` (models/forecaster.py) for the
supported family — parity pinned in tests/test_pallas.py.
"""
from __future__ import annotations

import functools

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

# Cell counts whose Mosaic lowering has been compiled AND timed on real TPU
# hardware (docs/design.md rollout table). ``auto`` dispatch (predict,
# streaming forecast, artifact export with tpu_kernel=auto) only selects the
# kernel for these; explicit ``rollout_impl: pallas`` / ``tpu_kernel=require``
# may opt into any family ``rollout_pallas_fits`` accepts. 3-cell validated
# on v5e 2026-08-19 (experiments/tpu_revalidate_r4.sh step 1): cold Mosaic
# compile green, parity 1.2e-4 vs the XLA scan, 21.72 vs 34.29 ms at the
# flagship nowcast_128 shape (-36.7%); warm streaming forecast h=10
# 4.53 vs 5.60 ms (+19.1%).
_MOSAIC_VALIDATED_CELLS = (2, 3)

# Same gate for the streamed-I/O variant (frames/outputs/warm seeds resident
# in HBM, double-buffered per-step DMA). Hardware-validated at 128px (v5e
# 2026-08-19, revalidate step 4: server-side Mosaic compile green, parity
# 1.2e-4, 10.78 vs 15.46 ms at the bench shape = -30.3%), so ``auto`` may
# pick it for the shapes where it is the only fitting variant WITHIN the
# ``_MOSAIC_VALIDATED_MAX_DIM`` envelope (e.g. very long horizons at
# <=128px, where the resident variant's VMEM I/O block overflows). The
# 256x256 shapes the variant was originally built for remain excluded by
# the envelope gate below: FOUR cold-compile attempts blew 3600-7200 s
# budgets (it is the 256px Mosaic compile itself, not the DMA descriptors
# — design.md "Streamed-I/O rollout variant"), so auto serves the XLA scan
# there; explicit ``rollout_impl: pallas`` may still opt in.
_MOSAIC_VALIDATED_STREAMED = True

# Largest spatial extent whose server-side Mosaic compile has actually
# finished on hardware. Every validated compile+timing (cold, warm, 2- and
# 3-cell, streamed 128px) is at <=128x128; the 256x256 compiles have now
# blown their budgets FOUR times (r4 steps 5/6 at 3600 s; r5 steps 1/2 at
# 7200 s — incl. the RESIDENT variant on a mostly-idle host, so it is the
# 256px Mosaic compile itself, not the DMA descriptors or CPU contention —
# design.md "Streamed-I/O rollout variant"). Until one
# completes, ``auto`` dispatch must not route a user-facing predict/forecast
# call into a >2 h cold compile: the XLA scan serves larger frames. Explicit
# ``rollout_impl: pallas`` may still opt in.
_MOSAIC_VALIDATED_MAX_DIM = 128

# Largest spatial extent at which the row-tile loop inside the kernel body is
# PYTHON-UNROLLED (the form every validated <=128px program compiled with —
# keeping it byte-identical preserves the persistent compile cache). Beyond
# this, ``cell_pass`` runs as a traced ``lax.fori_loop`` over row tiles
# instead: Mosaic's vector code then contains ONE tile body rather than
# n_tiles copies. Evidence that code size is what kills the big compiles:
# nb=4 at the bench shape (4x the unrolled vector code, same op count) took
# the compile from ~2 min to >35 min (killed; see ``_fits_vmem``), and all
# four 256px attempts — whose unrolled form is ~4x the 128px code — blew
# 1-2 h budgets. A looped 256px body is ~6x SMALLER than the validated
# 128px programs, so the compile should be minutes, not hours.
_TILE_UNROLL_MAX_DIM = 128


def _pick_tile(h: int) -> int:
    for cand in (16, 8, 4, 2, 1):
        if h % cand == 0:
            return cand
    return 1


def _wp(wid: int) -> int:
    """Padded scratch width: (W + 2) rounded up to the 16-sublane tile."""
    return -((-(wid + 2)) // 16) * 16


def _seed_lanes(n_cells: int, ch: int) -> int:
    """Packed warm-seed lane count, padded up to the 128-lane tile."""
    return -((-n_cells * ch) // 128) * 128


def _vmem_cost(t_in, t_out, nb, h, w, ch, itemsize, warm=False,
               n_cells=2, streamed=False) -> int:
    lanes = 2 * ch
    wp = _wp(w)
    tile = _pick_tile(h)
    xh = 2 * n_cells * nb * (h + 2) * wp * lanes * itemsize  # ping-pong pairs
    # c1|c2 pack one 2ch-lane buffer; a 3rd cell adds a ch-lane buffer
    cb = nb * h * w * (lanes + (ch if n_cells > 2 else 0)) * itemsize
    acc = nb * tile * w * 4 * ch * 4
    wts = n_cells * 9 * lanes * 4 * ch * itemsize
    if streamed:
        # frames/outputs stay in HBM: 2 double-buffered frame slots in, 2
        # staging slots out; a warm start adds one (h0|c0) staging buffer
        io = 4 * nb * h * w * itemsize
        if warm:
            io += nb * h * w * _seed_lanes(n_cells, ch) * itemsize
    else:
        io = nb * (t_in + 2 * t_out) * h * w * itemsize
        if warm:  # the packed (h0, c0) seeds live in VMEM, lane-padded to 128
            io += 2 * nb * h * w * _seed_lanes(n_cells, ch) * itemsize
    return xh + cb + acc + wts + io


def _fits_vmem(t_in, t_out, h, w, ch, itemsize, warm=False,
               n_cells=2, streamed=False) -> bool:
    """True when one batch item's rollout state fits the VMEM budget.

    The kernel processes batch items one per grid step (nb=1, the leading
    block dim). Folding nb>1 items into the matmul M dim was a MEASURED
    NEGATIVE (round 3): nb=4 at the bench shape multiplies Mosaic's fully-
    unrolled vector code by nb and the kernel compile went from ~2 min to
    >35 min (killed) — while at equal vector-register footprint (smaller row
    tile) batching saves zero ops. The measured 28.6% win already includes
    the sequential-batch grid."""
    return _vmem_cost(t_in, t_out, 1, h, w, ch, itemsize, warm,
                      n_cells, streamed) <= _VMEM_LIMIT


def _family_ok(t_in, t_out, c, h, w, hidden_dims, kernel_size) -> bool:
    n_cells = len(hidden_dims)
    if n_cells not in (2, 3) or any(d != hidden_dims[0]
                                    for d in hidden_dims[1:]):
        return False
    ch = hidden_dims[0]
    if c != 1 or kernel_size != 3 or t_in < 1 or t_out < 1:
        return False
    if h % 8 or w % 8 or ch % 8:
        return False
    if (2 * ch) % 128:  # packed (h|x) / (h|h) lane layout must tile cleanly
        return False
    return True


def pick_io_mode(t_in, t_out, h, w, ch, itemsize, warm=False, n_cells=2,
                 auto: bool = False):
    """Resolve the kernel I/O variant for a shape: ``"resident"`` (frames and
    outputs VMEM-resident — the measured-fastest variant where it fits),
    ``"streamed"`` (HBM-resident I/O with double-buffered per-step DMA — the
    only variant whose budget admits the 256x256 serving family), or ``None``
    (neither fits / not validated for implicit selection)."""
    if _fits_vmem(t_in, t_out, h, w, ch, itemsize, warm, n_cells):
        return "resident"
    if _fits_vmem(t_in, t_out, h, w, ch, itemsize, warm, n_cells,
                  streamed=True):
        if auto and not _MOSAIC_VALIDATED_STREAMED:
            return None
        return "streamed"
    return None


def rollout_pallas_fits(t_in: int, t_out: int, b: int, c: int, h: int, w: int,
                        hidden_dims, kernel_size: int, itemsize: int,
                        warm: bool = False, auto: bool = False) -> bool:
    """Static dispatch check for the supported shape family + VMEM budget
    (either I/O variant — ``pick_io_mode`` chooses which one serves).

    ``auto=True`` (implicit selection paths) additionally restricts to the
    on-device-validated ``_MOSAIC_VALIDATED_CELLS`` families / validated I/O
    variants / ``_MOSAIC_VALIDATED_MAX_DIM`` spatial envelope (the 256px
    compiles have never finished on hardware — a user-facing call must not
    gamble a multi-hour cold compile); explicit user opt-in
    (``rollout_impl: pallas``) passes ``auto=False``."""
    if not _family_ok(t_in, t_out, c, h, w, hidden_dims, kernel_size):
        return False
    n_cells = len(hidden_dims)
    if auto and n_cells not in _MOSAIC_VALIDATED_CELLS:
        return False
    if auto and max(h, w) > _MOSAIC_VALIDATED_MAX_DIM:
        return False
    ch = hidden_dims[0]
    return pick_io_mode(t_in, t_out, h, w, ch, itemsize, warm, n_cells,
                        auto) is not None


def _rollout_body(*refs, t_in: int, t_out: int, ch: int, hgt: int, wid: int,
                  tile: int, nb: int, n_cells: int, warm: bool,
                  streamed: bool = False, tile_loop: bool = False):
    """``nb`` is pinned to 1 (one batch item per grid step; the leading
    block-spec dim). The shape algebra below keeps the nb symbol because the
    leading block dim exists regardless — but nb>1 is a recorded compile-time
    negative (see _fits_vmem), so treat every [nb, ...] as [1, ...].

    Positional refs (pallas_call order — inputs, outputs, scratch):
    frames, [h0, c0 (warm)], w/b per cell, wh, bh | out | xh per cell,
    cell-state buffer(s) (c1|c2 packed; a second buffer holds c3).
    ``streamed`` appends: fr slots, out staging, [seed staging], frame/out
    DMA semaphores, [seed semaphore] — frames/out/(h0,c0) are then whole
    HBM-resident arrays indexed by ``pl.program_id`` and moved by
    double-buffered async copies instead of pipelined VMEM blocks."""
    i = 0
    frames_ref = refs[i]; i += 1
    h0_ref = c0_ref = None
    if warm:
        h0_ref, c0_ref = refs[i], refs[i + 1]; i += 2
    wb_refs = [(refs[i + 2 * k], refs[i + 2 * k + 1])
               for k in range(n_cells)]; i += 2 * n_cells
    wh_ref, bh_ref = refs[i], refs[i + 1]; i += 2
    out_ref = refs[i]; i += 1
    xh_refs = list(refs[i:i + n_cells]); i += n_cells
    n_cbufs = 1 if n_cells <= 2 else 2
    cbuf_refs = list(refs[i:i + n_cbufs]); i += n_cbufs
    if streamed:
        fr_vmem = refs[i]; i += 1
        ostage = refs[i]; i += 1
        sstage = None
        if warm:
            sstage = refs[i]; i += 1
        fsem, osem = refs[i], refs[i + 1]; i += 2
        ssem = refs[i] if warm else None
    # cell k's state lives in (buffer, lane0): c1|c2 pack the first buffer
    c_slot = [(cbuf_refs[k // 2], (k % 2) * ch) for k in range(n_cells)]

    lanes = 2 * ch
    n_tiles = hgt // tile
    steps = t_in + t_out - 1
    m = nb * tile * wid
    gi = pl.program_id(0)   # batch item (streamed indexes HBM arrays by it)

    def frame_dma(t, slot):
        """frames[gi, t] HBM -> fr slot. Descriptor shared by start/wait."""
        return pltpu.make_async_copy(
            frames_ref.at[pl.ds(gi, nb), pl.ds(t, 1)],
            fr_vmem.at[slot], fsem.at[slot])

    def out_dma(t_o, slot):
        """out staging slot -> out[gi, t_o] HBM. Same-descriptor rule as
        ``frame_dma``; all slots move equal byte counts, so the drain below
        may reconstruct descriptors by static index."""
        return pltpu.make_async_copy(
            ostage.at[slot], out_ref.at[pl.ds(gi, nb), pl.ds(t_o, 1)],
            osem.at[slot])

    # zero-init: borders stay zero forever (writes touch interiors only),
    # which IS the model's zero initial state + SAME-padding. A warm start
    # (streaming forecast branch) seeds the step-0 read slots instead: h1
    # into cell-1's h lanes, each later cell's own h into its buffer's
    # previous-step lanes, c into the packed cell-state buffers — the
    # h-from-below lanes (0:ch of cells >= 2) are written in-step by the
    # cell below's pass, so they need no seeding.
    for x in xh_refs:
        x[...] = jnp.zeros_like(x)
    if streamed:
        # prefetch frame 0 while the seeds load / buffers zero
        frame_dma(0, 0).start()
    if not warm:
        for cb in cbuf_refs:
            cb[...] = jnp.zeros_like(cb)
    else:
        if streamed:
            # the packed seeds stay in HBM; stage each through one VMEM
            # buffer (sequentially — ~2x less staging VMEM than two)
            h_dma = pltpu.make_async_copy(h0_ref.at[pl.ds(gi, nb)], sstage,
                                          ssem)
            h_dma.start()
            h_dma.wait()
            h0_src, c0_src = sstage, sstage
        else:
            h0_src, c0_src = h0_ref, c0_ref
        xh_refs[0][0, :, 1:1 + hgt, 1:1 + wid, 0:ch] = h0_src[..., 0:ch]
        for k in range(1, n_cells):
            xh_refs[k][0, :, 1:1 + hgt, 1:1 + wid, ch:2 * ch] = \
                h0_src[..., k * ch:(k + 1) * ch]
        if streamed:
            c_dma = pltpu.make_async_copy(c0_ref.at[pl.ds(gi, nb)], sstage,
                                          ssem)
            c_dma.start()
            c_dma.wait()
        cbuf_refs[0][...] = c0_src[..., 0:lanes]
        if n_cells > 2:
            cbuf_refs[1][...] = c0_src[..., 2 * ch:3 * ch]

    def load_frame(t, cur: int):
        # [nb, H, W] (W on lanes) -> [nb, H, W, 1] (W on sublanes): one
        # relayout per encode step; t is a traced step index. Mosaic supports
        # the minor-dim-inserting reshape only for 32-bit vectors — via f32.
        if streamed:
            fr = fr_vmem[cur].astype(jnp.float32)   # [nb, 1, H, W]
        else:
            fr = frames_ref[:, pl.ds(t, 1)].astype(jnp.float32)
        return fr.reshape(nb, hgt, wid, 1)

    def cell_pass(src_ref, dst_ref, dst_lane0, w_ref, b_ref, c_ref, c_lane0,
                  also_ref=None, also_lane0=0):
        """One full cell update: conv(src) -> gates with c -> h into dst
        (and optionally mirrored into ``also``, for the h that feeds both
        this cell's next step and the cell above's current step)."""
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
            c_cur = c_ref[:, r0:r0 + tile, :, c_lane0:c_lane0 + ch]
            h_new, c_new = convlstm_gates(z, c_cur.astype(jnp.float32))
            h_new = h_new.astype(xh_refs[0].dtype)
            c_ref[:, r0:r0 + tile, :, c_lane0:c_lane0 + ch] = \
                c_new.astype(c_ref.dtype)
            dst_ref[:, r0 + 1:r0 + 1 + tile, 1:1 + wid,
                    dst_lane0:dst_lane0 + ch] = h_new
            if also_ref is not None:
                also_ref[:, r0 + 1:r0 + 1 + tile, 1:1 + wid,
                         also_lane0:also_lane0 + ch] = h_new

    def cell_pass_looped(src_ref, dst_ref, dst_lane0, w_ref, b_ref, c_ref,
                         c_lane0, also_ref=None, also_lane0=0):
        """``cell_pass`` with the row-tile loop TRACED (``lax.fori_loop``)
        instead of python-unrolled: Mosaic compiles ONE tile body rather than
        n_tiles copies, which is what makes the >128px compiles tractable
        (see ``_TILE_UNROLL_MAX_DIM``). Every dynamic row index lands on the
        refs' dim 1 — a non-tiled major dim (the tiled pair is the trailing
        (sublane=width, lane=channels)) — so traced starts are Mosaic-legal;
        iterations write disjoint row ranges, so semantics match the
        unrolled form exactly."""
        def tile_body(ti, _):
            r0 = ti * tile
            acc = jnp.broadcast_to(b_ref[0].astype(jnp.float32),
                                   (m, 4 * ch))
            for tap in range(9):
                di, dj = tap // 3, tap % 3
                win = src_ref[:, pl.ds(r0 + di, tile), dj:dj + wid, :]
                acc = acc + jnp.dot(win.reshape(m, lanes),
                                    w_ref[tap],
                                    preferred_element_type=jnp.float32)
            z = acc.reshape(nb, tile, wid, 4 * ch)
            c_cur = c_ref[:, pl.ds(r0, tile), :, c_lane0:c_lane0 + ch]
            h_new, c_new = convlstm_gates(z, c_cur.astype(jnp.float32))
            h_new = h_new.astype(xh_refs[0].dtype)
            c_ref[:, pl.ds(r0, tile), :, c_lane0:c_lane0 + ch] = \
                c_new.astype(c_ref.dtype)
            dst_ref[:, pl.ds(r0 + 1, tile), 1:1 + wid,
                    dst_lane0:dst_lane0 + ch] = h_new
            if also_ref is not None:
                also_ref[:, pl.ds(r0 + 1, tile), 1:1 + wid,
                         also_lane0:also_lane0 + ch] = h_new
            return 0

        jax.lax.fori_loop(0, n_tiles, tile_body, 0)

    if tile_loop:
        cell_pass = cell_pass_looped  # noqa: F811 — head_pass stays unrolled
        # (its vector code is ~1/10th of the cells': K=ch, N=1 taps — and its
        # output writes index the SUBLANE dim, where dynamic starts are the
        # one Mosaic-risky case; not worth it for the code-size tail)

    def head_pass(src_ref, t, x_dst_ref, o_slot: int):
        """3x3 head conv over the top cell's h (lanes [ch:2ch] of src) ->
        prediction; written to the output frame t_out slot (streamed: the
        ``o_slot`` staging buffer, DMA'd to HBM by the caller) and, for the
        autoregressive feed, into lane ch of the next step's cell-1 input."""
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
                o3.astype(xh_refs[0].dtype)
            # [nb, tile, W, 1] -> [nb, 1, tile, W] (W back onto lanes) for
            # the result; t_o is a traced output-frame index
            o4 = o3.reshape(nb, 1, tile, wid)
            if streamed:
                ostage[o_slot, :, :, r0:r0 + tile, :] = \
                    o4.astype(ostage.dtype)
            else:
                out_ref[:, pl.ds(t_o, 1), r0:r0 + tile, :] = \
                    o4.astype(out_ref.dtype)

    def one_step(t, cur: int):
        """Step t: buffers read from slot ``cur``, write to ``1 - cur``.
        ``cur`` is a static python int (the loop runs over step pairs), and
        t's parity equals ``cur`` — so every DMA slot below is static."""
        nxt = 1 - cur
        srcs = [x.at[cur] for x in xh_refs]
        dsts = [x.at[nxt] for x in xh_refs]

        # encode phase: overwrite the x lane with the observed frame
        @pl.when(t < t_in)
        def _():
            if streamed:
                # prefetch frame t+1 into the other slot while t lands
                @pl.when(t + 1 < t_in)
                def _():
                    frame_dma(t + 1, nxt).start()
                frame_dma(t, cur).wait()
            fr = load_frame(t, cur).astype(xh_refs[0].dtype)
            srcs[0][:, 1:1 + hgt, 1:1 + wid, ch:ch + 1] = fr

        # cell 1: h1_new -> next cell-1 buffer (lanes 0:ch) AND the CURRENT
        # cell-2 buffer (lanes 0:ch) — cell 2 consumes this step's h1.
        # Mid cells mirror their h likewise into the cell above's buffer;
        # the top cell only feeds its own next step (lanes ch:2ch).
        for k in range(n_cells):
            w_ref, b_ref = wb_refs[k]
            c_ref, c_lane0 = c_slot[k]
            dst_lane0 = 0 if k == 0 else ch
            if k + 1 < n_cells:
                cell_pass(srcs[k], dsts[k], dst_lane0, w_ref, b_ref,
                          c_ref, c_lane0, also_ref=srcs[k + 1], also_lane0=0)
            else:
                cell_pass(srcs[k], dsts[k], dst_lane0, w_ref, b_ref,
                          c_ref, c_lane0)

        # head (only once predictions start): prediction t_out slot + the
        # autoregressive x for step t+1. Output frame t_o = t - (t_in - 1)
        # always lands in staging slot t_o % 2 == (cur + t_in - 1) % 2.
        o_slot = (cur + t_in - 1) % 2

        @pl.when(t >= t_in - 1)
        def _():
            if streamed:
                # slot o_slot last carried frame t_o - 2: its copy-out must
                # land before this frame's tiles overwrite the staging
                @pl.when(t - (t_in - 1) >= 2)
                def _():
                    out_dma(t - (t_in - 1) - 2, o_slot).wait()
            head_pass(dsts[n_cells - 1], t, dsts[0], o_slot)
            if streamed:
                out_dma(t - (t_in - 1), o_slot).start()

    def pair_body(i, _):
        one_step(2 * i, 0)
        one_step(2 * i + 1, 1)
        return 0

    jax.lax.fori_loop(0, steps // 2, pair_body, 0)
    if steps % 2:
        one_step(steps - 1, (steps - 1) % 2)

    if streamed:
        # drain the in-flight copy-outs (the final one or two output frames)
        # before the next grid step reuses the staging buffers
        for t_o in range(max(0, t_out - 2), t_out):
            out_dma(t_o, t_o % 2).wait()


def _launch_rollout(packed, frames, h0, c0, t_out: int, interpret=None,
                    streamed: bool = False):
    """Shared pallas_call scaffolding for the cold (h0/c0 None) and warm
    variants — one place owns block specs, scratch shapes, and VMEM policy.

    ``streamed``: frames/outputs (and warm seeds) stay HBM-resident and move
    through double-buffered async copies instead of whole-array VMEM blocks —
    the variant whose budget admits the 256x256 serving family (the
    per-frame slots cost ~4 frames of VMEM instead of t_in + 2*t_out).

    ``interpret``: None = auto (interpreter on non-TPU backends); an explicit
    bool overrides — cross-platform ``jax.export`` lowering for TPU from a
    CPU-only host must pass False or the artifact silently captures the
    interpreter emulation instead of the Mosaic kernel."""
    n_cells = (len(packed) - 2) // 2
    cell_wb, (whp, bh) = packed[:2 * n_cells], packed[2 * n_cells:]
    b, t_in, hgt, wid = frames.shape
    ch = cell_wb[2].shape[1] // 2          # cell-2 kernel contracts 2*ch
    dtype = frames.dtype
    tile = _pick_tile(hgt)
    warm = h0 is not None
    nb = 1   # one batch item per grid step; see _fits_vmem for why not more
    if not _fits_vmem(t_in, t_out, hgt, wid, ch, jnp.dtype(dtype).itemsize,
                      warm, n_cells, streamed):
        raise ValueError("rollout kernel VMEM budget exceeded — dispatch bug")

    body = functools.partial(_rollout_body, t_in=t_in, t_out=t_out, ch=ch,
                             hgt=hgt, wid=wid, tile=tile, nb=nb,
                             n_cells=n_cells, warm=warm, streamed=streamed,
                             tile_loop=max(hgt, wid) > _TILE_UNROLL_MAX_DIM)
    lanes = 2 * ch
    grid_block = lambda n: pl.BlockSpec((nb, n, hgt, wid),
                                        lambda i: (i, 0, 0, 0),
                                        memory_space=pltpu.VMEM)
    state_block = lambda: pl.BlockSpec((nb, hgt, wid, h0.shape[-1]),
                                       lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = lambda: pl.BlockSpec(memory_space=pl.ANY)
    in_specs = ([hbm() if streamed else grid_block(t_in)]
                + ([hbm(), hbm()] if (warm and streamed)
                   else [state_block(), state_block()] if warm else [])
                + [full()] * len(packed))
    args = (frames,) + ((h0, c0) if warm else ()) + packed

    # padded width rounded up to the 16-sublane tile: the per-step
    # .at[slot] sub-ref slice requires tiling-aligned sublane extents
    scratch = [pltpu.VMEM((2, nb, hgt + 2, _wp(wid), lanes), dtype)
               for _ in range(n_cells)]                    # xh a/b per cell
    scratch.append(pltpu.VMEM((nb, hgt, wid, lanes), dtype))   # c1|c2
    if n_cells > 2:
        scratch.append(pltpu.VMEM((nb, hgt, wid, ch), dtype))     # c3
    if streamed:
        scratch.append(pltpu.VMEM((2, nb, 1, hgt, wid), dtype))   # fr slots
        scratch.append(pltpu.VMEM((2, nb, 1, hgt, wid), dtype))   # out stage
        if warm:
            scratch.append(pltpu.VMEM((nb, hgt, wid, h0.shape[-1]),
                                      dtype))                     # seed stage
        scratch.append(pltpu.SemaphoreType.DMA((2,)))             # frames
        scratch.append(pltpu.SemaphoreType.DMA((2,)))             # outputs
        if warm:
            scratch.append(pltpu.SemaphoreType.DMA(()))           # seeds

    return pl.pallas_call(
        body,
        grid=(b // nb,),
        in_specs=in_specs,
        out_specs=(hbm() if streamed else grid_block(t_out)),
        out_shape=jax.ShapeDtypeStruct((b, t_out, hgt, wid), dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret() if interpret is None else interpret,
    )(*args)


@functools.partial(jax.jit,
                   static_argnames=("t_out", "interpret", "streamed"))
def _run_rollout(frames, t_out: int, interpret=None, streamed=False,
                 *packed):
    """frames: [B, T_in, H, W] (channel squeezed); returns [B, t_out, H, W].
    ``packed``: (w, b) per cell + (wh, bh), flat (``_pack_weights``)."""
    return _launch_rollout(tuple(packed), frames, None, None, t_out,
                           interpret, streamed)


@functools.partial(jax.jit,
                   static_argnames=("t_out", "interpret", "streamed"))
def _run_rollout_warm(frames, h0, c0, t_out: int, interpret=None,
                      streamed=False, *packed):
    """Decode-only rollout from a warm recurrent state.

    frames: [B, 1, H, W] — the autoregressive seed (the stream's last emitted
    frame); h0/c0: [B, H, W, lanes] packed (cell1 | ... | celln) hidden/cell
    state, lane-padded up to a 128 multiple (pad lanes are never read). Runs t_in=1 so step 0 consumes the seed frame against
    the warm state and the head emits from step 0 — exactly horizon=t_out
    free-running steps."""
    return _launch_rollout(tuple(packed), frames, h0, c0, t_out, interpret,
                           streamed)


def _cells_from_core(core):
    """Cell params (``cell_0``..``cell_{n-1}``) from the forecaster core.

    Validates the family loudly: direct callers (experiments, serving code)
    can bypass ``rollout_pallas_fits``, and an unsupported tree would
    otherwise produce finite-but-wrong forecasts."""
    from ..convlstm import ConvLSTMParams
    n = sum(1 for k in core if k.startswith("cell_"))
    cells = [ConvLSTMParams(core[f"cell_{i}"]["kernel"],
                            core[f"cell_{i}"]["bias"]) for i in range(n)]
    widths = [c.kernel.shape[-1] // 4 for c in cells]
    if n not in (2, 3) or any(w != widths[0] for w in widths):
        # recorded family boundary: padding mixed widths (e.g. the parity
        # Generator's (16, 32)) to the 128-lane MXU tile inflates tap FLOPs
        # ~3-4x to chase a <=30% I/O win — see docs/design.md "Why the kernel
        # family stops at equal widths"
        raise ValueError(f"rollout kernel supports 2-3 equal-width cells, "
                         f"got {n} cells with widths {widths}")
    return cells


def _pack_weights(cells, head_kernel, head_bias, ch: int, dtype):
    """Repack canonical forecaster params for the kernel's lane layout.

    cell-1 kernel [3,3,1+ch,4ch] contracts (h1 | x | zeros) lanes: rows
    reordered h-first, x row at lane ch, zero rows to 2*ch. Later cells'
    kernels [3,3,2ch,4ch] already match (h_below | h_own). Head [3,3,ch,1]
    -> [9, ch, 1]. Returns a flat tuple: (w, b) per cell + (wh, bh)."""
    k1 = cells[0].kernel.astype(dtype)
    w1p = jnp.zeros((9, 2 * ch, 4 * ch), dtype)
    w1p = w1p.at[:, 0:ch].set(k1[:, :, 1:1 + ch].reshape(9, ch, 4 * ch))
    w1p = w1p.at[:, ch].set(k1[:, :, 0].reshape(9, 4 * ch))
    packed = [w1p, cells[0].bias.astype(dtype).reshape(1, 4 * ch)]
    for cell in cells[1:]:
        packed.append(cell.kernel.astype(dtype).reshape(9, 2 * ch, 4 * ch))
        packed.append(cell.bias.astype(dtype).reshape(1, 4 * ch))
    packed.append(head_kernel.astype(dtype).reshape(9, ch, 1))
    packed.append(head_bias.astype(dtype).reshape(1, 1))
    return tuple(packed)


def _resolve_io_mode(io_mode: str, t_in, t_out, hgt, wid, ch, itemsize,
                     warm: bool, n_cells: int) -> bool:
    """``io_mode`` ('auto' | 'resident' | 'streamed') -> the ``streamed``
    flag, validating the VMEM budget of the resolved variant loudly."""
    if io_mode == "auto":
        mode = pick_io_mode(t_in, t_out, hgt, wid, ch, itemsize, warm,
                            n_cells)
        if mode is None:
            raise ValueError("rollout kernel VMEM budget exceeded for this "
                             "shape in both I/O variants — use the XLA scan")
        return mode == "streamed"
    if io_mode not in ("resident", "streamed"):
        raise ValueError(f"io_mode must be auto|resident|streamed, "
                         f"got {io_mode!r}")
    if not _fits_vmem(t_in, t_out, hgt, wid, ch, itemsize, warm, n_cells,
                      streamed=(io_mode == "streamed")):
        fitting = pick_io_mode(t_in, t_out, hgt, wid, ch, itemsize, warm,
                               n_cells)
        hint = (f"; the '{fitting}' variant fits — use io_mode='{fitting}' "
                f"or 'auto'" if fitting else
                "; no variant fits — use the XLA scan")
        raise ValueError(f"forced io_mode={io_mode!r} exceeds the rollout "
                         f"kernel VMEM budget at this shape{hint}")
    return io_mode == "streamed"


def rollout_pallas(params, frames, t_out: int,
                   compute_dtype=jnp.bfloat16, interpret=None,
                   io_mode: str = "auto") -> jnp.ndarray:
    """Free-running rollout via the VMEM-resident kernel.

    ``params``: a ConvLSTMForecaster param pytree (2-3 equal-width cells +
    head, models/forecaster.py); ``frames``: [B, T_in, 1, H, W] (NCHW like
    the model); returns [B, t_out, 1, H, W] float32 — same contract as
    ``model.apply(params, frames)`` at inference. ``interpret``: see
    ``_launch_rollout`` — cross-platform TPU export from a CPU host must
    pass False to capture the Mosaic kernel, not the interpreter.
    ``io_mode``: 'auto' picks resident I/O where it fits, else streamed
    (HBM frames/outputs + double-buffered DMA); explicit values force a
    variant (benchmarking)."""
    core = params["params"]["core"]
    cells = _cells_from_core(core)
    ch = cells[0].kernel.shape[-1] // 4
    b, t_in, c, hgt, wid = frames.shape
    if c != 1:
        # ValueError, not assert: direct callers may bypass rollout_pallas_fits,
        # and under python -O a stripped assert would silently drop channels 1+
        raise ValueError("rollout kernel supports 1-channel frames, got "
                         f"{c} channels")
    streamed = _resolve_io_mode(io_mode, t_in, t_out, hgt, wid, ch,
                                jnp.dtype(compute_dtype).itemsize, False,
                                len(cells))

    packed = _pack_weights(cells, core["head"]["kernel"],
                           core["head"]["bias"], ch, compute_dtype)
    fr = frames[:, :, 0].astype(compute_dtype)          # [B, T_in, H, W]
    out = _run_rollout(fr, t_out, interpret, streamed, *packed)
    return out[:, :, None].astype(jnp.float32)          # [B, t_out, 1, H, W]


def rollout_pallas_from_state(core, cells, prev_out, horizon: int,
                              compute_dtype=jnp.bfloat16,
                              interpret=None,
                              io_mode: str = "auto") -> jnp.ndarray:
    """Free-running rollout branched from a WARM recurrent state.

    The streaming counterpart of ``rollout_pallas``: instead of encoding an
    input window from zeros, the kernel's VMEM state buffers are seeded from
    the carried stream state and every step is a decode step.

    ``core``: the ConvLSTMForecaster scan-core param mapping (the
    ``params['params']['core']`` subtree of a full checkpoint pytree —
    ``cell_<i>``/``head`` entries; streaming callers hold exactly this);
    ``cells``: ``((h1, c1), ..., (hn, cn))`` NHWC ``[B, H, W, ch]`` each;
    ``prev_out``: ``[B, H, W, C]`` — the stream's last emitted frame (the
    autoregressive input for the first step). Returns ``[B, horizon, 1, H, W]``
    float32 — same contract as ``StreamingForecaster._forecast_scan``
    (streaming.py), parity pinned in tests/test_pallas.py."""
    cell_params = _cells_from_core(core)
    ch = cell_params[0].kernel.shape[-1] // 4
    if prev_out.shape[-1] != 1:
        raise ValueError("rollout kernel supports 1-channel frames, got "
                         f"{prev_out.shape[-1]} channels")
    if len(cells) != len(cell_params):
        raise ValueError(f"{len(cells)} state pairs for "
                         f"{len(cell_params)} cells")

    hgt, wid = prev_out.shape[1], prev_out.shape[2]
    streamed = _resolve_io_mode(io_mode, 1, horizon, hgt, wid, ch,
                                jnp.dtype(compute_dtype).itemsize, True,
                                len(cell_params))
    packed = _pack_weights(cell_params, core["head"]["kernel"],
                           core["head"]["bias"], ch, compute_dtype)
    h0 = jnp.concatenate([hc[0] for hc in cells], -1).astype(compute_dtype)
    c0 = jnp.concatenate([hc[1] for hc in cells], -1).astype(compute_dtype)
    # pad the packed lane dim up to the 128-lane tile (3 cells x 64ch = 192):
    # the kernel never reads the pad lanes, and a tile-aligned minor dim keeps
    # the state block in the Mosaic layout family the 2-cell path validated
    pad = -h0.shape[-1] % 128
    if pad:
        widths = [(0, 0)] * 3 + [(0, pad)]
        h0, c0 = jnp.pad(h0, widths), jnp.pad(c0, widths)
    fr = jnp.transpose(prev_out, (0, 3, 1, 2)).astype(compute_dtype)
    out = _run_rollout_warm(fr, h0, c0, horizon, interpret, streamed,
                            *packed)
    return out[:, :, None].astype(jnp.float32)          # [B, horizon, 1, H, W]
