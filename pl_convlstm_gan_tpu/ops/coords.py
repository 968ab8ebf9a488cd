"""CoordConv channel generation.

Reference semantics (``/root/reference/src/models/coordconv.py:3-10``): append two
channels holding normalized row/col coordinates, ``linspace(0, 1, H)`` broadcast over
columns and ``linspace(0, 1, W)`` broadcast over rows.

TPU-build notes: the coordinate planes are pure functions of the *static* spatial shape,
so under ``jit`` they constant-fold; we expose ``coord_channels`` separately so callers
can hoist it out of a ``lax.scan`` body. Layout is NHWC (TPU-native)."""
from __future__ import annotations

import jax.numpy as jnp


def coord_channels(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """[H, W, 2] normalized (row, col) coordinate planes."""
    row = jnp.linspace(0.0, 1.0, h, dtype=dtype)[:, None]        # [H, 1]
    col = jnp.linspace(0.0, 1.0, w, dtype=dtype)[None, :]        # [1, W]
    row = jnp.broadcast_to(row, (h, w))
    col = jnp.broadcast_to(col, (h, w))
    return jnp.stack([row, col], axis=-1)                        # [H, W, 2]


def add_coord_channels(x: jnp.ndarray) -> jnp.ndarray:
    """x: [B, H, W, C] -> [B, H, W, C+2] with row/col coordinate channels appended."""
    b, h, w, _ = x.shape
    coords = coord_channels(h, w, x.dtype)
    coords = jnp.broadcast_to(coords[None], (b, h, w, 2))
    return jnp.concatenate([x, coords], axis=-1)
