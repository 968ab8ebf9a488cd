"""SSIM (structural similarity) for nowcasting evaluation.

North-star metric (BASELINE.json config #3: "5-in/20-out rollout with SSIM eval").
Standard Wang et al. 2004 formulation with an 11x11 Gaussian window (sigma 1.5),
matching the torchmetrics/skimage defaults (gaussian window, K1=0.01, K2=0.03).

TPU-first: the Gaussian window is separable, so local means/variances are computed
with two 1-D depthwise convolutions (VALID padding, per skimage/torchmetrics
convention of cropping the border) — all fused by XLA."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def _gaussian_kernel(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable VALID gaussian filter over H, W of [N, H, W, 1]."""
    n = win.shape[0]
    kh = win.reshape(n, 1, 1, 1)
    kw = win.reshape(1, n, 1, 1)
    dn = ("NHWC", "HWIO", "NHWC")
    y = lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn)
    return lax.conv_general_dilated(y, kw, (1, 1), "VALID", dimension_numbers=dn)


def _ssim_map(pred: jnp.ndarray, target: jnp.ndarray, data_range: float,
              window_size: int, sigma: float, k1: float, k2: float):
    """Flattened-leading-dims SSIM map [N, H', W', 1] (VALID-cropped border)."""
    if pred.shape[-1] == 1 and pred.ndim >= 3:
        p, t = pred, target
    else:
        p, t = pred[..., None], target[..., None]
    h, w = p.shape[-3], p.shape[-2]
    p = p.reshape(-1, h, w, 1).astype(jnp.float32)
    t = t.reshape(-1, h, w, 1).astype(jnp.float32)

    # frames smaller than the window (e.g. 8x8 coarse tiles) would give a
    # negative VALID output dim; clamp to the largest odd size that fits
    # (skimage's win_size rule), keeping the default 11 for normal imagery
    eff = min(window_size, h, w)
    if eff % 2 == 0:
        eff -= 1
    win = jnp.asarray(_gaussian_kernel(eff, sigma))
    mu_p = _blur(p, win)
    mu_t = _blur(t, win)
    # E[X^2] - E[X]^2 cancels catastrophically in f32 when the signal carries a
    # large offset (|x| ~ 3e2 -> error ~1e-2 >> c2), which can drive the true
    # ~0 variance negative and the denominator through zero (observed as
    # ssim=inf on early-training GAN rollouts). Variance is nonnegative by
    # definition — clamp it, keeping den >= c1*c2 > 0 always.
    mu_pp = jnp.maximum(_blur(p * p, win) - mu_p * mu_p, 0.0)
    mu_tt = jnp.maximum(_blur(t * t, win) - mu_t * mu_t, 0.0)
    mu_pt = _blur(p * t, win) - mu_p * mu_t
    # The covariance suffers the same cancellation: its error survives the
    # variance clamps and can put |num| >> den (SSIM ~ 20 instead of ~1 on
    # offset-dominated windows). Cauchy-Schwarz bounds the true value:
    # |cov| <= sqrt(var_p * var_t) — clamp to that, keeping SSIM in [-1, 1].
    # double-where guards sqrt's infinite derivative at 0: constant/blank
    # windows (zero variance) are ubiquitous in nowcasting, and a bare sqrt
    # would make jax.grad return NaN there the moment ssim is used as a
    # training loss term (it is exported for exactly that).
    var_prod = mu_pp * mu_tt
    safe_prod = jnp.where(var_prod > 0, var_prod, 1.0)
    cov_bound = jnp.where(var_prod > 0, jnp.sqrt(safe_prod), 0.0)
    mu_pt = jnp.clip(mu_pt, -cov_bound, cov_bound)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    num = (2 * mu_p * mu_t + c1) * (2 * mu_pt + c2)
    den = (mu_p ** 2 + mu_t ** 2 + c1) * (mu_pp + mu_tt + c2)
    return num / den


def ssim(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0,
         window_size: int = 11, sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """Mean SSIM over all frames. pred/target: [..., H, W] (any leading dims; a
    trailing channel dim of size 1 is also accepted as [..., H, W, 1])."""
    return _ssim_map(pred, target, data_range, window_size, sigma, k1, k2).mean()


def ssim_per_sample(pred: jnp.ndarray, target: jnp.ndarray,
                    data_range: float = 1.0, window_size: int = 11,
                    sigma: float = 1.5, k1: float = 0.01,
                    k2: float = 0.03) -> jnp.ndarray:
    """Per-sample mean SSIM [B] over a batch-leading tensor — lets eval mask
    wrap-padded rows and aggregate exactly across batches."""
    b = pred.shape[0]
    m = _ssim_map(pred, target, data_range, window_size, sigma, k1, k2)
    return m.reshape(b, -1).mean(axis=1)
