"""PixelShuffle (depth-to-space) matching ``torch.nn.PixelShuffle`` channel ordering.

Reference use: the 2x super-resolution step in ``UpsampleBlock``
(``/root/reference/src/models/generator.py:10-28``).

Torch semantics (NCHW): out[b, c, h*r+i, w*r+j] = in[b, c*r*r + i*r + j, h, w].
In our NHWC layout the channel axis is last, so the equivalent is a reshape of the last
dim to (C_out, r, r) followed by a transpose interleaving (r, r) into (H, W) — pure
data movement that XLA fuses into the surrounding ops."""
from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, upscale_factor: int) -> jnp.ndarray:
    """x: [B, H, W, C*r*r] -> [B, H*r, W*r, C] (torch PixelShuffle channel order)."""
    r = upscale_factor
    b, h, w, crr = x.shape
    c = crr // (r * r)
    if c * r * r != crr:
        raise ValueError(f"Channel dim {crr} not divisible by r^2={r * r}")
    y = x.reshape(b, h, w, c, r, r)
    y = y.transpose(0, 1, 4, 2, 5, 3)      # [B, H, r, W, r, C]
    return y.reshape(b, h * r, w * r, c)
