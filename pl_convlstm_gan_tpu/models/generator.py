"""Generator: coordconv stem -> 2-cell ConvLSTM recurrence -> PixelShuffle x8 upsample
-> DEM/LUCC attention fusion -> conv head.

Capability parity with the reference Generator (``/root/reference/src/models/
generator.py:31-205``) with a TPU-first restructure:

- The Python time loop (generator.py:164-205) becomes a ``lax.scan`` (via ``nn.scan``)
  carrying ``(h1, c1, h2, c2)`` — compiled once, O(1) code size in T.
- The HR decode (upsample -> attention -> head) has *no* cross-time dependence, so
  instead of running per-timestep inside the loop it runs ONCE over the merged
  ``(T*B)`` batch after the scan — bigger matmuls for the MXU, better utilization
  (an optimization the reference structure precludes; SURVEY.md §3.3).
- Upsample blocks are constructed statically from the resolved scale factor: the
  reference's lazy first-forward construction (generator.py:73-92,128-132) is a
  PyTorch wart that makes the param set depend on the first call — here the resolved
  scale is static at trace time, so the block count (= floor(log2(int(scale)))) is
  config-determined and checkpoints are stable.
- Dual sizing modes preserved: ``scale_factor`` OR ``target_grid_size`` (meters) with
  ``input_grid_size`` passed at call time (generator.py:39-48,106-126), including the
  non-power-of-2 remainder bilinear path (generator.py:179-195) and exact
  target-size resize (generator.py:188-195).

Public tensor API mirrors the reference (NCHW-style [B, T, 1, H, W] in/out); layout is
transposed once at the boundary to NHWC internally."""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.coords import add_coord_channels
from ..ops.resize import resize_bilinear, resize_nearest
from .layers import (Conv2dTorch, ConvLSTMCell, GatedCovariateAttention,
                     SplitInputConvLSTMCell, UpsampleBlock)


class _RecurrentCore(nn.Module):
    """Scan body: N stacked ConvLSTM cells (the reference hardwires two,
    generator.py:57-58,170-171; param names cell1/cell2/... keep 2-cell
    checkpoints and the torch parity mapping stable)."""
    hidden_dims: Tuple[int, ...]
    kernel_size: int
    impl: str
    dtype: Optional[jnp.dtype]
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, carry, x_t):
        states = list(carry)
        x = x_t
        for li, feat in enumerate(self.hidden_dims):
            h, c = states[2 * li], states[2 * li + 1]
            h, c = ConvLSTMCell(feat, self.kernel_size, impl=self.impl,
                                dtype=self.dtype, param_dtype=self.param_dtype,
                                name=f"cell{li + 1}")(x, h, c)
            states[2 * li], states[2 * li + 1] = h, c
            x = h
        return tuple(states), x


class _SplitRecurrentCore(nn.Module):
    """Scan core with cell1's input-side conv hoisted out of the scan.

    The Generator's inputs for ALL timesteps are known before the recurrence
    (unlike the forecaster's decode), so cell1's x-contribution is one conv
    over the merged (T*B) batch (``precompute``) and the scanned ``step`` only
    does cell1's h-side conv + gates and the remaining stacked cells. Param
    tree ("cell1", "cell2", ...) is identical to ``_RecurrentCore`` — the two
    schedules are checkpoint-interchangeable."""
    hidden_dims: Tuple[int, ...]
    kernel_size: int
    impl: str
    dtype: Optional[jnp.dtype]
    param_dtype: jnp.dtype

    def setup(self):
        hd = self.hidden_dims
        self.cell1 = SplitInputConvLSTMCell(
            hd[0], in_features=hd[0], kernel_size=self.kernel_size,
            dtype=self.dtype, param_dtype=self.param_dtype)
        others = []
        for li in range(1, len(hd)):
            setattr(self, f"cell{li + 1}",
                    ConvLSTMCell(hd[li], self.kernel_size, impl=self.impl,
                                 dtype=self.dtype,
                                 param_dtype=self.param_dtype))
            others.append(getattr(self, f"cell{li + 1}"))
        self._others = tuple(others)

    def precompute(self, x_merged):
        """[T*B, H, W, hd0] -> cell1 x-side pre-activations [T*B, H, W, 4*hd0]."""
        return self.cell1.precompute_x(x_merged)

    def step(self, carry, zx_t):
        states = list(carry)
        h, c = self.cell1.step(zx_t, states[0], states[1])
        states[0], states[1] = h, c
        x = h
        for li, cell in enumerate(self._others, start=1):
            h, c = cell(x, states[2 * li], states[2 * li + 1])
            states[2 * li], states[2 * li + 1] = h, c
            x = h
        return tuple(states), x


def resolve_scale(h: int, w: int,
                  scale_factor: Optional[float],
                  target_grid_size: Optional[Tuple[int, int]],
                  input_grid_size: Optional[Tuple[int, int]]):
    """Resolve (scale, target_size) per the reference's dual sizing modes
    (generator.py:106-126). All-static: runs in Python at trace time."""
    if target_grid_size is not None and input_grid_size is not None:
        input_gx, input_gy = input_grid_size
        target_gx, target_gy = target_grid_size
        scale_w = input_gx / target_gx
        scale_h = input_gy / target_gy
        target_size = (int(h * scale_h), int(w * scale_w))
        return max(scale_h, scale_w), target_size
    if scale_factor is not None:
        return float(scale_factor), None
    return 1.0, None


def num_upsample_blocks(scale: float) -> int:
    """floor(log2(int(scale))) 2x blocks; remainder handled by bilinear
    (reference generator.py:73-92)."""
    s = int(scale)
    n = 0
    while s >= 2:
        n += 1
        s //= 2
    return n


class Generator(nn.Module):
    """Spatiotemporal downscaling generator. See module docstring."""
    in_channels: int = 1
    dem_channels: int = 1
    lu_channels: int = 0
    hidden_dims: Sequence[int] = (16, 32)
    target_grid_size: Optional[Tuple[int, int]] = None
    scale_factor: Optional[float] = None
    kernel_size: int = 3
    convlstm_impl: str = "xla"
    # hoist cell1's x-side conv out of the scan as one merged-(T*B) conv (all
    # inputs are known in advance for this model family); measured win on TPU
    # -> see docs/design.md split-cell section. Same param tree either way.
    split_precompute: bool = False
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rain_lr, dem, lu, input_grid_size=None):
        """rain_lr: [B, T, C, H, W]; dem: [B, Cd, Hd, Wd]; lu: [B, Cl, Hl, Wl]
        (reference layout, generator.py:94-100). Returns [B, T, 1, H', W']."""
        b, t, _, h, w = rain_lr.shape
        hd = tuple(self.hidden_dims)
        cdtype = self.dtype or rain_lr.dtype

        scale, target_size = resolve_scale(h, w, self.scale_factor,
                                           self.target_grid_size, input_grid_size)
        n_blocks = num_upsample_blocks(scale)
        remaining = scale / (2 ** n_blocks)
        if target_size is not None:
            final_h, final_w = target_size
        else:
            final_h, final_w = int(h * scale), int(w * scale)

        # --- boundary: NCHW-style -> time-major NHWC ---
        x = jnp.transpose(rain_lr, (1, 0, 3, 4, 2)).astype(cdtype)  # [T, B, H, W, C]

        # --- stem: coordconv + init_conv over the merged (T*B) batch ---
        xm = x.reshape(t * b, h, w, self.in_channels)
        xm = add_coord_channels(xm)
        xm = nn.relu(Conv2dTorch(hd[0], (3, 3), padding=1, dtype=cdtype,
                                 param_dtype=self.param_dtype, name="init_conv")(xm))
        x = xm.reshape(t, b, h, w, hd[0])

        # --- recurrence: lax.scan over time, carry = per-cell (h, c) at LR ---
        zeros = lambda ch: jnp.zeros((b, h, w, ch), cdtype)
        carry0 = tuple(z for f in hd for z in (zeros(f), zeros(f)))
        if self.split_precompute:
            core = _SplitRecurrentCore(
                hidden_dims=hd, kernel_size=self.kernel_size,
                impl=self.convlstm_impl, dtype=cdtype,
                param_dtype=self.param_dtype, name="recurrence")
            zx = core.precompute(xm).reshape(t, b, h, w, 4 * hd[0])
            scan_step = nn.scan(_SplitRecurrentCore.step,
                                variable_broadcast="params",
                                split_rngs={"params": False},
                                in_axes=0, out_axes=0)
            _, top_seq = scan_step(core, carry0, zx)           # [T, B, H, W, hd-1]
        else:
            core = nn.scan(_RecurrentCore,
                           variable_broadcast="params",
                           split_rngs={"params": False},
                           in_axes=0, out_axes=0)(
                hidden_dims=hd, kernel_size=self.kernel_size,
                impl=self.convlstm_impl, dtype=cdtype,
                param_dtype=self.param_dtype, name="recurrence")
            _, top_seq = core(carry0, x)                       # [T, B, H, W, hd-1]

        # --- decode ONCE over merged (T*B): upsample -> attention -> head ---
        feat = top_seq.reshape(t * b, h, w, hd[-1])
        for i in range(n_blocks):
            feat = UpsampleBlock(hd[-1], 2, dtype=cdtype,
                                 param_dtype=self.param_dtype,
                                 name=f"upsample_{i}")(feat)
        if remaining > 1:
            rh, rw = feat.shape[1], feat.shape[2]
            feat = resize_bilinear(feat, int(rh * remaining), int(rw * remaining))
        if target_size is not None:
            feat = resize_bilinear(feat, final_h, final_w)

        # covariates to final size: DEM bilinear, LUCC nearest (generator.py:143-153).
        # The attention gates depend only on the per-B covariates, so they are
        # computed ONCE over B and broadcast over the time axis — tiling the
        # covariates to (T*B) would materialize T redundant copies and run the
        # gate convs T-fold for identical results.
        dem_hr = resize_bilinear(jnp.transpose(dem, (0, 2, 3, 1)).astype(cdtype),
                                 final_h, final_w)
        lu_hr = resize_nearest(jnp.transpose(lu, (0, 2, 3, 1)).astype(cdtype),
                               final_h, final_w)

        feat = feat.reshape(t, b, final_h, final_w, hd[-1])
        feat = GatedCovariateAttention(hd[-1], dtype=cdtype,
                                       param_dtype=self.param_dtype,
                                       name="dem_attn")(feat, dem_hr)
        feat = GatedCovariateAttention(hd[-1], dtype=cdtype,
                                       param_dtype=self.param_dtype,
                                       name="lu_attn")(feat, lu_hr)
        feat = feat.reshape(t * b, final_h, final_w, hd[-1])

        out = Conv2dTorch(32, (3, 3), padding=1, dtype=cdtype,
                          param_dtype=self.param_dtype, name="post_conv1")(feat)
        out = nn.relu(out)
        out = Conv2dTorch(1, (3, 3), padding=1, dtype=cdtype,
                          param_dtype=self.param_dtype, name="post_conv2")(out)

        # --- boundary: back to [B, T, 1, H', W'] ---
        out = out.reshape(t, b, final_h, final_w, 1)
        return jnp.transpose(out, (1, 0, 4, 2, 3)).astype(jnp.float32)
