"""Sharpness metrics for evaluating adversarial training quality.

L1/SSIM cannot distinguish "blurry mean-seeking prediction" from "sharp
realistic prediction" — the failure mode a GAN term exists to fix (the
reference has no GAN at all, SURVEY.md §0; this instruments the north-star
extension). Two complementary, jit-friendly measures, each reported as a
pred/target RATIO so 1.0 = "as sharp as ground truth":

- ``hf_energy_fraction``: fraction of 2-D spectral power above half the
  Nyquist radius (radially-thresholded power spectrum). Blur removes high
  frequencies first, so blurry rollouts score << target.
- ``grad_mag_mean``: mean spatial gradient magnitude (total-variation
  density). The cheap, local counterpart to the spectral measure.

Both are per-sample reductions over all frames, aggregated in (sum, weight)
form like every other eval metric (train/steps.py eval builders)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _hf_mask(h: int, w: int, cutoff: float) -> np.ndarray:
    """Boolean mask of rfft2 bins whose radial frequency exceeds
    ``cutoff`` x Nyquist. Frequencies normalized per-axis so non-square
    frames threshold isotropically."""
    fy = np.fft.fftfreq(h)[:, None] * 2.0        # [-1, 1) cycles/Nyquist
    fx = np.fft.rfftfreq(w)[None, :] * 2.0       # [0, 1]
    return np.sqrt(fy * fy + fx * fx) > cutoff


def hf_energy_fraction(x: jnp.ndarray, cutoff: float = 0.5) -> jnp.ndarray:
    """High-frequency spectral power fraction per sample.

    x: [B, T, C, H, W] (or any [..., H, W] with >= 1 leading axes; the first
    axis is the sample axis). Returns [B] fractions in [0, 1]."""
    h, w = x.shape[-2], x.shape[-1]
    spec = jnp.abs(jnp.fft.rfft2(x.astype(jnp.float32))) ** 2
    mask = jnp.asarray(_hf_mask(h, w, cutoff), jnp.float32)
    b = x.shape[0]
    total = spec.reshape(b, -1, *spec.shape[-2:]).sum(axis=(1, 2, 3))
    hf = (spec * mask).reshape(b, -1, *spec.shape[-2:]).sum(axis=(1, 2, 3))
    return hf / jnp.maximum(total, 1e-12)


def grad_mag_mean(x: jnp.ndarray) -> jnp.ndarray:
    """Mean forward-difference gradient magnitude per sample.
    x: [B, ..., H, W] -> [B]."""
    dx = jnp.abs(jnp.diff(x, axis=-1))
    dy = jnp.abs(jnp.diff(x, axis=-2))
    b = x.shape[0]
    return 0.5 * (dx.reshape(b, -1).mean(axis=1) + dy.reshape(b, -1).mean(axis=1))


def sharpness_sums(pred: jnp.ndarray, target: jnp.ndarray, valid_mask
                   ) -> dict:
    """(sum, weight) pairs for the sharpness ratios over one eval batch:
    hf_pred/hf_target and gm_pred/gm_target accumulate separately so the host
    forms the ratio of EXACT global means (not a mean of per-batch ratios)."""
    vm = valid_mask.astype(jnp.float32)
    nv = vm.sum()
    out = {}
    for name, fn in (("hf", hf_energy_fraction), ("gm", grad_mag_mean)):
        out[f"sharp_{name}_pred"] = ((fn(pred) * vm).sum(), nv)
        out[f"sharp_{name}_true"] = ((fn(target) * vm).sum(), nv)
    return out
