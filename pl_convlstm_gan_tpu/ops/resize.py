"""Spatial resize ops with exact PyTorch ``F.interpolate`` parity.

The reference leans on three interpolate modes whose edge semantics we must match
(SURVEY.md §7.3):

- ``bilinear, align_corners=False``  — covariate upsampling to the HR grid
  (``/root/reference/src/models/generator.py:143-148``) and non-power-of-2 remainder
  scaling (``generator.py:179-195``).
- ``nearest`` (PyTorch *legacy* asymmetric indexing, NOT half-pixel) — LUCC upsampling
  (``generator.py:149-153``).
- ``area`` (== adaptive average pooling) — mass-conservation loss downsampling
  (``/root/reference/src/losses/combined_loss.py:68-72``).

TPU-first design: rather than gather-based interpolation, bilinear and area resizes are
expressed as two small dense matrix multiplies (separable per axis): ``Y = A_h @ X @
A_w^T``. The interpolation matrices are computed in numpy at *trace* time (shapes are
static under jit), become XLA constants, and the resize runs on the MXU. ``nearest`` is a
static gather (``jnp.take``), which XLA lowers to a cheap copy.

All ops take NHWC and resize the H/W axes.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _bilinear_matrix(out_size: int, in_size: int) -> np.ndarray:
    """[out, in] interpolation weights matching torch bilinear align_corners=False.

    Source coordinate: src = (i + 0.5) * (in/out) - 0.5, clamped below at 0 (PyTorch
    clamps negative source coords to 0), linear blend of floor/ceil neighbors."""
    scale = in_size / out_size
    i = np.arange(out_size, dtype=np.float64)
    src = np.maximum((i + 0.5) * scale - 0.5, 0.0)
    x0 = np.floor(src).astype(np.int64)
    x0 = np.minimum(x0, in_size - 1)
    x1 = np.minimum(x0 + 1, in_size - 1)
    frac = src - x0
    a = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    np.add.at(a, (rows, x0), 1.0 - frac)
    np.add.at(a, (rows, x1), frac)
    return a


def _area_matrix(out_size: int, in_size: int) -> np.ndarray:
    """[out, in] averaging weights matching torch mode='area'
    (== adaptive_avg_pool: window [floor(i*in/out), ceil((i+1)*in/out)) )."""
    a = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -((-(i + 1) * in_size) // out_size)  # ceil((i+1)*in/out)
        a[i, start:end] = 1.0 / (end - start)
    return a


def _nearest_indices(out_size: int, in_size: int) -> np.ndarray:
    """PyTorch legacy 'nearest': src = floor(i * in/out) (asymmetric, no half-pixel)."""
    scale = in_size / out_size
    idx = np.floor(np.arange(out_size) * scale).astype(np.int64)
    return np.minimum(idx, in_size - 1)


def _apply_separable(x: jnp.ndarray, a_h: np.ndarray, a_w: np.ndarray) -> jnp.ndarray:
    """x: [..., H, W, C]; apply per-axis matrices on the MXU in f32, cast back."""
    out_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mh = jnp.asarray(a_h, dtype=jnp.float32)
    mw = jnp.asarray(a_w, dtype=jnp.float32)
    y = jnp.einsum("ph,...hwc->...pwc", mh, xf, preferred_element_type=jnp.float32)
    y = jnp.einsum("qw,...pwc->...pqc", mw, y, preferred_element_type=jnp.float32)
    return y.astype(out_dtype)


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """[..., H, W, C] -> [..., out_h, out_w, C]; torch bilinear align_corners=False."""
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    return _apply_separable(x, _bilinear_matrix(out_h, h), _bilinear_matrix(out_w, w))


def resize_area(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """[..., H, W, C] -> [..., out_h, out_w, C]; torch mode='area' (adaptive avg pool).

    Fast path: integer-factor downscale is a reshape-mean (pure VPU, no matmul)."""
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    if h % out_h == 0 and w % out_w == 0:
        fh, fw = h // out_h, w // out_w
        lead = x.shape[:-3]
        c = x.shape[-1]
        y = x.reshape(*lead, out_h, fh, out_w, fw, c)
        # accumulate in f32 so bf16 inputs get the same precision on this
        # path as on the matrix path below (which upcasts and casts back)
        return y.mean(axis=(-4, -2), dtype=jnp.float32).astype(x.dtype)
    return _apply_separable(x, _area_matrix(out_h, h), _area_matrix(out_w, w))


def resize_nearest(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """[..., H, W, C] -> [..., out_h, out_w, C]; torch legacy 'nearest' indexing."""
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    ih = jnp.asarray(_nearest_indices(out_h, h))
    iw = jnp.asarray(_nearest_indices(out_w, w))
    y = jnp.take(x, ih, axis=-3)
    return jnp.take(y, iw, axis=-2)


def resize(x: jnp.ndarray, out_h: int, out_w: int, method: str) -> jnp.ndarray:
    if method == "bilinear":
        return resize_bilinear(x, out_h, out_w)
    if method == "nearest":
        return resize_nearest(x, out_h, out_w)
    if method == "area":
        return resize_area(x, out_h, out_w)
    raise ValueError(f"Unknown resize method: {method}")
