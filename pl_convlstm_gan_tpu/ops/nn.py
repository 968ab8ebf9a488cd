"""Low-level NN helpers: NHWC conv wrapper and PyTorch-default initializers.

The reference relies on ``torch.nn.Conv2d`` defaults everywhere; for numerical-parity
testing on loaded weights *and* matching-at-init statistics, we reproduce PyTorch's
default init exactly: kaiming_uniform(a=sqrt(5)) on the kernel — which reduces to
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — and the same bound for the bias
(torch/nn/modules/conv.py reset_parameters semantics)."""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def conv2d(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None,
           stride: int | Sequence[int] = 1, padding="SAME") -> jnp.ndarray:
    """NHWC conv with HWIO kernel.

    x: [B, H, W, Cin], kernel: [Kh, Kw, Cin, Cout]. `padding` may be "SAME", "VALID",
    or an int (symmetric spatial pad, torch-style)."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    # NOTE: no preferred_element_type here — the TPU MXU accumulates bf16 convs in
    # f32 natively, and an explicit f32 preference breaks the VJP dtype contract
    # (f32 cotangent vs bf16 kernel) under mixed precision.
    out = lax.conv_general_dilated(
        x, kernel,
        window_strides=tuple(stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out if bias is None else out + bias.astype(out.dtype)


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """HWIO kernel init matching torch Conv2d default: U(+-1/sqrt(fan_in))."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    """Bias init matching torch Conv2d default: U(+-1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def hwio_from_oihw(kernel_oihw: np.ndarray) -> np.ndarray:
    """Convert a torch Conv2d weight [O, I, Kh, Kw] to HWIO for our conv wrapper."""
    return np.transpose(kernel_oihw, (2, 3, 1, 0))


def oihw_from_hwio(kernel_hwio: np.ndarray) -> np.ndarray:
    """Inverse of ``hwio_from_oihw``: HWIO -> torch Conv2d OIHW."""
    return np.transpose(kernel_hwio, (3, 2, 0, 1))
