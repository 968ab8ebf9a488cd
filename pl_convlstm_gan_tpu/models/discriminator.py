"""Conv (Patch-GAN style) discriminator for the GAN configs.

The reference repo has NO discriminator (SURVEY.md §0: verified absent); this is the
north-star extension ("generator + conv discriminator, alternating optax optimizers,
BCE+L1" — BASELINE.json configs #2/#5). Design: a per-frame strided-conv patch
discriminator applied over the merged (B*T) frame batch — time handled by averaging
frame logits, which keeps every conv a large batched MXU op instead of a 3D conv with
poor tiling at small T."""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import Conv2dTorch


class Discriminator(nn.Module):
    """Frames [B, T, C, H, W] -> patch logits [B, T, 1, H', W'] (pre-sigmoid)."""
    features: Sequence[int] = (64, 128, 256)
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, frames):
        b, t, c, h, w = frames.shape
        x = jnp.transpose(frames, (0, 1, 3, 4, 2)).reshape(b * t, h, w, c)
        cdtype = self.dtype or x.dtype
        x = x.astype(cdtype)
        for i, feat in enumerate(self.features):
            x = Conv2dTorch(feat, (4, 4), strides=(2, 2), padding=1, dtype=cdtype,
                            param_dtype=self.param_dtype, name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        x = Conv2dTorch(1, (4, 4), strides=(1, 1), padding=1, dtype=cdtype,
                        param_dtype=self.param_dtype, name="conv_out")(x)
        hp, wp = x.shape[1], x.shape[2]
        x = x.reshape(b, t, hp, wp, 1)
        return jnp.transpose(x, (0, 1, 4, 2, 3)).astype(jnp.float32)
