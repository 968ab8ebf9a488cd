"""Shared flax building blocks: torch-default-init conv, ConvLSTM cell module,
upsample block, covariate attention gates.

These re-express the reference's building blocks (SURVEY.md §2.1 rows 4-7) as flax
modules over the functional ops in ``pl_convlstm_gan_tpu.ops``. Layout is NHWC; params
stay in ``param_dtype`` (f32) while compute runs in ``dtype`` (f32 or bf16)."""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

import jax

from ..ops.convlstm import (ConvLSTMParams, convlstm_precompute_x,
                            convlstm_step, convlstm_step_precomputed,
                            convlstm_step_tp)
from ..ops.nn import conv2d, torch_bias_init, torch_kernel_init
from ..ops.pixel_shuffle import pixel_shuffle


class Conv2dTorch(nn.Module):
    """NHWC conv with PyTorch Conv2d default init (kaiming_uniform(a=sqrt(5)))."""
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: int | str = "SAME"
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param("kernel", torch_kernel_init,
                            (kh, kw, cin, self.features), self.param_dtype)
        dtype = self.dtype or x.dtype
        bias = None
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(kh * kw * cin),
                              (self.features,), self.param_dtype)
            bias = bias.astype(dtype)
        return conv2d(x.astype(dtype), kernel.astype(dtype), bias,
                      stride=self.strides, padding=self.padding)


class ConvLSTMCell(nn.Module):
    """One ConvLSTM cell (reference: src/models/convlstm.py:4-28) as a flax module.

    The actual step runs through ``ops.convlstm.convlstm_step`` so the XLA and Pallas
    implementations are interchangeable under identical parameters.

    ``tp_shards > 1`` runs the tensor-parallel variant: parameters are held in
    the shard-major per-gate layout (ops.convlstm.convlstm_step_tp) so a plain
    last-axis PartitionSpec over the 'model' mesh axis channel-shards the cell;
    ``tp_mesh`` (the 2-D device mesh) anchors sharding propagation inside the
    scan with with_sharding_constraint."""
    features: int
    kernel_size: int = 3
    impl: str = "xla"
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32
    tp_shards: int = 1
    tp_mesh: Optional[object] = None   # jax.sharding.Mesh (hashable, static)
    tp_axis: str = "model"

    @nn.compact
    def __call__(self, x, h, c):
        cin = x.shape[-1] + self.features
        k = self.kernel_size
        kernel = self.param("kernel", torch_kernel_init,
                            (k, k, cin, 4 * self.features), self.param_dtype)
        bias = self.param("bias", torch_bias_init(k * k * cin),
                          (4 * self.features,), self.param_dtype)
        dtype = self.dtype or x.dtype
        params = ConvLSTMParams(kernel.astype(dtype), bias.astype(dtype))
        if self.tp_shards > 1:
            if self.impl == "pallas":
                raise ValueError("tensor parallelism requires the XLA cell")
            constrain = None
            if self.tp_mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                # UNCONSTRAINED batch dim: the anchor must only pin the
                # channel axis to 'model' — P(None, ...) on dim 0 would force
                # the batch REPLICATED across the data axis and silently undo
                # DP inside every scan step (each device recomputing the full
                # global batch). UNCONSTRAINED lets the partitioner keep
                # whatever batch sharding the caller established.
                sh = NamedSharding(
                    self.tp_mesh,
                    P(P.UNCONSTRAINED, None, None, self.tp_axis))
                constrain = lambda a: jax.lax.with_sharding_constraint(a, sh)
            return convlstm_step_tp(params, x.astype(dtype), h.astype(dtype),
                                    c.astype(dtype), self.tp_shards, constrain)
        return convlstm_step(params, x.astype(dtype), h.astype(dtype),
                             c.astype(dtype), impl=self.impl)


class SplitInputConvLSTMCell(nn.Module):
    """ConvLSTM cell with the input-side conv split out for pre-scan batching.

    Parameter layout, names, and init are IDENTICAL to ``ConvLSTMCell`` (one
    fused kernel [K, K, Cin+Ch, 4Ch] + bias), so checkpoints and the torch
    parity mapping are interchangeable; only the execution schedule differs:
    ``precompute_x`` runs once over all timesteps merged (T*B) OUTSIDE the
    scan, and ``step`` does just the h-side conv + gates inside it."""
    features: int
    in_features: int
    kernel_size: int = 3
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        cin = self.in_features + self.features
        k = self.kernel_size
        self.kernel = self.param("kernel", torch_kernel_init,
                                 (k, k, cin, 4 * self.features),
                                 self.param_dtype)
        self.bias = self.param("bias", torch_bias_init(k * k * cin),
                               (4 * self.features,), self.param_dtype)

    def _params(self, dtype):
        return ConvLSTMParams(self.kernel.astype(dtype),
                              self.bias.astype(dtype))

    def precompute_x(self, x):
        """[N, H, W, in_features] -> x-side pre-activations [N, H, W, 4*Ch]."""
        dtype = self.dtype or x.dtype
        return convlstm_precompute_x(self._params(dtype), x.astype(dtype),
                                     self.in_features)

    def step(self, z_x, h, c):
        dtype = self.dtype or z_x.dtype
        return convlstm_step_precomputed(self._params(dtype),
                                         z_x.astype(dtype), h.astype(dtype),
                                         c.astype(dtype), self.in_features)


class UpsampleBlock(nn.Module):
    """conv(C -> C*r^2, 3x3) -> PixelShuffle(r) -> ReLU
    (reference: src/models/generator.py:10-28)."""
    features: int
    upscale: int = 2
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv2dTorch(self.features * self.upscale ** 2, (3, 3), padding=1,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name="conv")(x)
        x = pixel_shuffle(x, self.upscale)
        return nn.relu(x)


class GatedCovariateAttention(nn.Module):
    """x * sigmoid(conv1x1(relu(conv3x3(cov)))) multiplicative gating
    (reference: src/models/attention.py:3-26; DEM and LUCC variants share the
    shape).

    The gate depends only on the covariate, so when ``x`` carries one extra
    leading (time) axis over ``cov`` — features [T, B, H, W, C] against a
    static per-sample covariate [B, H, W, Cc] — the gate is computed ONCE over
    B and broadcast over T, instead of tiling the covariate T-fold (exact:
    the convs are per-sample)."""
    features: int
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cov):
        a = Conv2dTorch(self.features // 2, (3, 3), padding=1, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="conv_reduce")(cov)
        a = nn.relu(a)
        a = Conv2dTorch(self.features, (1, 1), padding=0, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="conv_gate")(a)
        gate = nn.sigmoid(a)
        if x.ndim == cov.ndim + 1:   # time-major features, static covariate
            gate = gate[None]
        return x * gate
