"""int8 post-training-quantized serving rollout for the forecaster families.

A TPU-native serving extension with no reference counterpart (the reference
is f32-only, ``/root/reference/src/models/generator.py``): v5e's MXU runs
s8 x s8 -> s32 convolutions at 2x the bf16 rate, so quantizing the rollout's
convs — where all the FLOPs are — targets the compute-bound half of
autoregressive serving. Numerics are validated against the f32 scan on CPU
(``tests/test_quant.py``); the speed claim is gated on hardware measurement
(the ``int8 scan`` row of ``experiments/rollout_kernel_bench.py`` plus
``experiments/int8_quality.py`` for checkpoint quality), per the repo's
kernel-validation discipline.

Why this needs NO calibration data (the usual PTQ burden): every conv
input's activation scale is computed dynamically per step and per SAMPLE
(one VPU absmax over [H, W, C] against four MXU convs per cell) — robust to
decode-phase drift with zero calibration passes, deterministic under dynamic
batching (no batchmate coupling), and bit-identical under the data-parallel
predict shard_map.

- The frame input is unbounded (observed frames during encode, the model's
  own predictions during decode) so a dynamic scale is *required* there. The
  linearity split ``conv(x ++ h) == conv_x(x) + conv_h(h)``
  (ops/convlstm.py:130-136) is what lets the frame and hidden inputs of the
  first cell carry different scales.
- Hidden states are bounded by construction (``h = sigmoid(o) * tanh(c')``
  gives ``|h| < 1`` strictly), so the analytic 1/127 scale
  (``ops.quant.UNIT_SCALE``) would be *safe* — but converged checkpoints
  hold hidden activations far below the bound, and the static grid cost
  0.1-0.19 SSIM on trained models (design.md, round-5 trained-ckpt eval
  of the original static-scale variant). Hidden inputs therefore use the
  same per-sample dynamic scale.
- Weights are per-output-channel symmetric int8; the dequant is a [4*Ch]
  broadcast multiply XLA fuses into the conv epilogue.

Gate math stays f32 on the VPU (sigmoid/tanh are not MXU work; the states
round-trip through int8 only as *conv inputs*, the carried h/c remain f32 so
quantization error does not accumulate in the recurrence state itself).

The scan body mirrors ``ConvLSTMForecaster``'s inference path (encode
t_in frames, then autoregressive decode — models/forecaster.py:40-59) minus
the training-only scheduled-sampling plumbing; parity of the phase
scheduling is pinned by ``tests/test_quant.py`` against the flax model."""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
from jax import lax

from ..ops.convlstm import convlstm_gates
from ..ops.quant import (QuantConv, apply_quant_conv, dynamic_scale,
                         quantize_conv)


class Int8Cell0(NamedTuple):
    """First cell, linearity-split: x-side conv (frame input, no bias) +
    h-side conv (carries the cell bias). Both take per-sample dynamic act
    scales at apply time (`_int8_step`)."""
    conv_x: QuantConv
    conv_h: QuantConv


class Int8Forecaster(NamedTuple):
    """Quantized forecaster parameters (a jit-traversable pytree).

    ``cells`` are the stacked cells above the first, each one fused int8
    conv over concat(h_below, h_own) — both inputs tanh-bounded, so the
    fused conv keeps the single-contraction shape of the float path."""
    cell0: Int8Cell0
    cells: Tuple[QuantConv, ...]
    head: QuantConv


def prepare_int8_forecaster(params) -> Int8Forecaster:
    """Quantize a trained forecaster/GAN-generator checkpoint for int8 serving.

    ``params``: the flax variables of ``ConvLSTMForecaster`` (the
    ``params/core/cell_i|head`` tree — same input contract as
    ``ops.pallas.rollout_kernel.rollout_pallas``). One-time cost at load;
    the returned tree is what the jitted rollout closes over."""
    core = params["params"]["core"]
    n = sum(1 for k in core if k.startswith("cell_"))
    if n < 1:
        raise ValueError("not a forecaster param tree (no core/cell_* nodes)")
    k0 = core["cell_0"]["kernel"]
    b0 = core["cell_0"]["bias"]
    ch = k0.shape[-1] // 4
    cin_x = k0.shape[2] - ch
    cell0 = Int8Cell0(
        conv_x=quantize_conv(k0[:, :, :cin_x], None, act_scale=None),
        conv_h=quantize_conv(k0[:, :, cin_x:], b0),
    )
    cells = tuple(
        quantize_conv(core[f"cell_{i}"]["kernel"], core[f"cell_{i}"]["bias"])
        for i in range(1, n))
    head = quantize_conv(core["head"]["kernel"], core["head"]["bias"])
    return Int8Forecaster(cell0, cells, head)


def _int8_step(q: Int8Forecaster, states, x):
    """One quantized stacked-cell step: x [B,H,W,C] f32 -> (new_states, out).

    EVERY conv input is quantized with a per-sample dynamic scale, not just
    the frame input. The analytic |h| < 1 bound makes the static 1/127 scale
    *safe* for hidden states but, on converged checkpoints, *wasteful*:
    trained hidden activations sit far below the bound (absmax ~0.05 gives
    ~6 effective levels out of 255), which is exactly the quality regression
    the trained-ckpt eval measured (design.md: nowcast_128 SSIM -0.098,
    gan_64 SSIM -0.190 with static scales; dynamic-scale re-eval queued in
    experiments/tpu_revalidate_r5b.sh). The extra
    cost is one VPU absmax per conv input — irrelevant next to int8's
    already-measured latency negative."""
    h0, c0 = states[0]
    zx = apply_quant_conv(q.cell0.conv_x, x, act_scale=dynamic_scale(x))
    zh = apply_quant_conv(q.cell0.conv_h, h0,   # carries the bias
                          act_scale=dynamic_scale(h0))
    h, c = convlstm_gates(zx + zh, c0)
    new_states = [(h, c)]
    for li, qc in enumerate(q.cells):
        hi, ci = states[li + 1]
        xc = jnp.concatenate([h, hi], axis=-1)
        z = apply_quant_conv(qc, xc, act_scale=dynamic_scale(xc))
        hi, ci = convlstm_gates(z, ci)
        new_states.append((hi, ci))
        h = hi
    out = apply_quant_conv(q.head, h, act_scale=dynamic_scale(h))
    return tuple(new_states), out


def _zero_states(q: Int8Forecaster, b: int, hgt: int, wid: int):
    widths = [q.cell0.conv_h.wq.shape[2]]
    widths += [qc.wq.shape[-1] // 4 for qc in q.cells]
    zeros = lambda f: jnp.zeros((b, hgt, wid, f), jnp.float32)
    return tuple((zeros(f), zeros(f)) for f in widths)


def rollout_int8(q: Int8Forecaster, frames: jnp.ndarray, t_out: int):
    """frames [B, T_in, C, H, W] -> predictions [B, t_out, C, H, W] (f32).

    Cold path: encode the observed window, then decode ``t_out`` steps
    autoregressively — one ``lax.scan`` of length T_in + t_out - 1 with the
    same phase scheduling as ``ConvLSTMForecaster.__call__``
    (models/forecaster.py:100-170)."""
    b, t_in, c, hgt, wid = frames.shape
    steps = t_in + t_out - 1
    x_seq = jnp.transpose(frames, (1, 0, 3, 4, 2)).astype(jnp.float32)
    pad = jnp.zeros((steps - t_in, b, hgt, wid, c), jnp.float32)
    frame_seq = jnp.concatenate([x_seq, pad], axis=0)
    # per-step scalar phase mask: at inference every batch element is in the
    # same phase (no per-sample teacher forcing), unlike the training scan
    use_frame = jnp.arange(steps) < t_in

    def body(carry, inp):
        states, prev_out = carry
        frame_t, use_f = inp
        x = jnp.where(use_f, frame_t, prev_out)
        new_states, out = _int8_step(q, states, x)
        return (new_states, out), out

    carry0 = (_zero_states(q, b, hgt, wid),
              jnp.zeros((b, hgt, wid, c), jnp.float32))
    _, outs = lax.scan(body, carry0, (frame_seq, use_frame))
    preds = outs[t_in - 1:t_in - 1 + t_out]
    return jnp.transpose(preds, (1, 0, 4, 2, 3))


def rollout_int8_from_state(q: Int8Forecaster, prev_out, states, horizon: int):
    """Warm-start decode for streaming serving: continue ``horizon`` steps
    from carried states. prev_out [B,H,W,C] f32, states: ((h,c),...) f32.
    Returns (predictions [B, horizon, C, H, W], prev_out', states').

    States from a float (possibly bf16) streaming assimilation are accepted:
    they are cast to f32 up front so the scan carry dtype is stable (the gate
    math emits f32)."""
    states = tuple((h.astype(jnp.float32), c.astype(jnp.float32))
                   for h, c in states)
    prev_out = prev_out.astype(jnp.float32)

    def body(carry, _):
        st, prev = carry
        new_states, out = _int8_step(q, st, prev)
        return (new_states, out), out

    (states, prev_out), outs = lax.scan(
        body, (states, prev_out), None, length=horizon)
    return jnp.transpose(outs, (1, 0, 4, 2, 3)), prev_out, states
