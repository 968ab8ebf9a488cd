"""int8 post-training quantization primitives for the serving path.

The reference has no quantized inference at all (pure f32 torch,
``/root/reference/src/models/generator.py``); this is a TPU-native serving
extension: v5e's MXU executes s8 x s8 -> s32 convolutions at twice the bf16
rate, so a weight+activation int8 forward halves the compute-bound part of
the autoregressive rollout. Everything here is symmetric (zero-point-free)
quantization — the TPU MXU int8 path has no zero-point handling, and
symmetric per-output-channel weight scales keep the dequant a single
broadcast multiply fused into the conv epilogue by XLA.

Design notes (why no calibration pass is needed — see
``models/quantized.py``): every conv input's scale is computed dynamically
per step and per sample from the tensor itself (one tiny VPU reduction vs
four MXU convs) — no calibration set, no saturation risk. Hidden states
(``h = sigmoid(o) * tanh(c)``, ``|h| < 1`` by construction) admit the
analytic constant 1/127 (``UNIT_SCALE``, kept as ``quantize_conv``'s static
default), but trained hidden activations sit far below the bound and the
static grid measurably costs SSIM on converged checkpoints — the serving
path passes dynamic scales everywhere.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax.numpy as jnp
from jax import lax

# symmetric int8 range: +-127 (not -128) keeps |q| * scale <= absmax exactly
# and the negation symmetric — the standard choice for MXU-friendly PTQ
QMAX = 127.0

# analytic activation scale for tanh/sigmoid-bounded tensors (|x| < 1)
UNIT_SCALE = 1.0 / QMAX


def quantize_weight(w: jnp.ndarray):
    """Per-output-channel symmetric int8 quantization of an HWIO kernel.

    w: [Kh, Kw, Cin, Cout] float. Returns ``(wq int8, scale f32 [Cout])``
    with ``w ~= wq * scale``. Scales are strictly positive even for an
    all-zero channel (guarded) so the dequant multiply never produces NaN."""
    w = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    scale = jnp.maximum(absmax, 1e-12) / QMAX
    wq = jnp.clip(jnp.round(w / scale), -QMAX, QMAX).astype(jnp.int8)
    return wq, scale


def quantize_act(x: jnp.ndarray, scale) -> jnp.ndarray:
    """Symmetric per-tensor int8 quantization: round(x / scale), clipped.

    ``scale`` is a scalar (static python float or traced 0-d array) or a
    broadcastable per-sample array (``dynamic_scale``). Values beyond
    +-127*scale saturate — callers either guarantee the bound analytically
    (hidden states) or derive ``scale`` from the tensor's own absmax (frame
    inputs)."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -QMAX, QMAX).astype(jnp.int8)


def dynamic_scale(x: jnp.ndarray):
    """Per-SAMPLE dynamic activation scale for [B, ...] activations:
    absmax over the non-batch axes / 127, shape [B, 1, ...] (broadcastable).

    Per-sample, not per-tensor, on purpose: a whole-batch absmax would make
    each sample's quantization grid depend on its batchmates' magnitudes —
    non-deterministic serving under dynamic batching, and shard-local scales
    would break data-parallel == single-device exactness under the predict
    shard_map. Floored so an all-zero tensor (the first decode step's
    padding) stays well-defined."""
    axes = tuple(range(1, x.ndim))
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes, keepdims=True)
    return jnp.maximum(absmax, 1e-12) / QMAX


def conv2d_int8(xq: jnp.ndarray, wq: jnp.ndarray,
                stride: int | Sequence[int] = 1, padding="SAME"):
    """NHWC int8 conv with int32 accumulation (the MXU s8s8->s32 path).

    xq: [B, H, W, Cin] int8, wq: [Kh, Kw, Cin, Cout] int8 -> int32. SAME/int
    padding semantics match ``ops.nn.conv2d``. Zero padding is exact in the
    symmetric scheme (quantized zero IS zero — no zero-point offset)."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    return lax.conv_general_dilated(
        xq, wq,
        window_strides=tuple(stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


class QuantConv(NamedTuple):
    """A quantized conv layer: int8 kernel + per-Cout dequant scale + f32 bias.

    ``act_scale`` is the STATIC activation scale the kernel was paired with
    (None = caller supplies a dynamic per-call scale)."""
    wq: jnp.ndarray            # [Kh, Kw, Cin, Cout] int8
    wscale: jnp.ndarray        # [Cout] f32
    bias: Optional[jnp.ndarray]  # [Cout] f32 or None
    act_scale: Optional[float] = UNIT_SCALE


def quantize_conv(kernel: jnp.ndarray, bias: Optional[jnp.ndarray],
                  act_scale: Optional[float] = UNIT_SCALE) -> QuantConv:
    """Package a float conv layer for int8 serving."""
    wq, wscale = quantize_weight(kernel)
    b = None if bias is None else bias.astype(jnp.float32)
    return QuantConv(wq, wscale, b, act_scale)


def apply_quant_conv(qc: QuantConv, x: jnp.ndarray, act_scale=None,
                     stride: int | Sequence[int] = 1, padding="SAME"):
    """Quantize ``x``, run the int8 conv, dequantize, add bias. Returns f32.

    ``act_scale`` overrides the layer's static scale (dynamic quantization).
    The dequant multiply ``s_x * wscale`` is a [Cout] broadcast XLA fuses
    into the conv's epilogue."""
    s = qc.act_scale if act_scale is None else act_scale
    z = conv2d_int8(quantize_act(x, s), qc.wq, stride, padding)
    out = z.astype(jnp.float32) * (s * qc.wscale)
    return out if qc.bias is None else out + qc.bias
