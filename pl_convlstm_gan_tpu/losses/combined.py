"""Four-term physics-informed CombinedLoss, pure XLA.

Semantics parity with the reference (``/root/reference/src/losses/combined_loss.py``):

- ``point_supervision_loss`` (:79-141): station coords scaled by
  ``(c + 0.5) * s - 0.5`` center alignment, bounds check, gather of predictions at
  station pixels, NaN-masked observations, intensity weights in {log1p, stratified
  >=10/25/50mm -> 2/3/5x, sqrt}, weighted-L1 mean over valid entries.
- ``conservation_loss`` (:64-74): area-interpolate prediction back to the LR grid,
  L1 against the LR input.
- ``gradient_loss`` (:146-155): mean |dx| + mean |dy| spatial smoothness.
- ``temporal_consistency_loss`` (:160-168): mean |pred_t - pred_{t+1}|.
- ``forward`` (:173-191): weighted sum + per-component dict.

TPU-first deltas: the reference's dynamic boolean indexing (``combined_loss.py:101-122``)
is jit-hostile (data-dependent shapes), so validity is handled with STATIC-shape masked
reductions: out-of-bounds stations and NaN observations contribute weight zero and the
mean divides by the mask sum. Station gathers use one `take` over flattened (row, col)
indices. All terms are differentiable and shard cleanly under data parallelism (they
are per-sample means; see parallel/train_parallel.py for the psum story).

Tensor layout: `pred`/`lr_input` follow the reference API: [B, T, 1, H, W]."""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def compute_sample_weights(rain_values: jnp.ndarray, use_weighted_loss: bool = True,
                           weight_strategy: str = "log") -> jnp.ndarray:
    """Intensity weighting (reference combined_loss.py:23-59)."""
    if not use_weighted_loss:
        return jnp.ones_like(rain_values)
    if weight_strategy == "log":
        return 1.0 + jnp.log1p(rain_values)
    if weight_strategy == "stratified":
        w = jnp.ones_like(rain_values)
        w = jnp.where(rain_values >= 10, 2.0, w)
        w = jnp.where(rain_values >= 25, 3.0, w)
        w = jnp.where(rain_values >= 50, 5.0, w)
        return w
    if weight_strategy == "sqrt":
        return 1.0 + jnp.sqrt(rain_values)
    return jnp.ones_like(rain_values)


def _station_pixel_indices(coords: jnp.ndarray, scale_factor, h: int, w: int):
    """Scale LR station coords to HR pixels with center alignment
    (reference combined_loss.py:96-104). Returns (rows, cols, valid_mask).

    The reference casts with torch ``.long()`` — truncation toward zero — so a
    slightly-negative scaled coordinate (coord 0 with scale < 0.5) maps to index 0
    (valid) rather than -1 (masked). float->int astype matches that semantics;
    ``floor`` would not."""
    scaled = (coords.astype(jnp.float32) + 0.5) * scale_factor - 0.5
    scaled = scaled.astype(jnp.int32)
    rows, cols = scaled[:, 0], scaled[:, 1]
    valid = (rows >= 0) & (rows < h) & (cols >= 0) & (cols < w)
    return jnp.clip(rows, 0, h - 1), jnp.clip(cols, 0, w - 1), valid


def _gather_stations(pred_vals: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray):
    """pred_vals [B, T, H, W] -> values at station pixels [B, T, N]."""
    h, w = pred_vals.shape[-2:]
    flat = pred_vals.reshape(*pred_vals.shape[:-2], h * w)
    return jnp.take(flat, rows * w + cols, axis=-1)


def prepare_station_batch(s_coords: jnp.ndarray, s_values: jnp.ndarray, batch: int):
    """Normalize station tensors to (coords [N,2], values [B,T,N]).

    The reference accepts coords as [N,2] or [B,N,2] (using item 0 — stations are
    identical across the batch for this dataset, combined_loss.py:90-93) and values as
    [T,N] or [B,T,N] (combined_loss.py:119-122)."""
    coords = s_coords[0] if s_coords.ndim == 3 else s_coords
    if s_values.ndim == 2:
        values = jnp.broadcast_to(s_values[None], (batch, *s_values.shape))
    else:
        values = s_values
    return coords, values


def _stations_pred_obs_mask(pred: jnp.ndarray, s_coords: jnp.ndarray,
                            s_values: jnp.ndarray, scale_factor,
                            batch_mask: jnp.ndarray | None):
    """Shared station prep for the point loss AND station RMSE: gather pred at
    scaled station pixels, NaN-mask observations, fold in the bounds mask and
    optional eval batch mask. Returns (pred_at [B,T,N], obs [B,T,N], mask)."""
    b, t, _, h, w = pred.shape
    pred_vals = pred[:, :, 0, :, :]
    coords, values = prepare_station_batch(s_coords, s_values, b)
    rows, cols, station_valid = _station_pixel_indices(coords, scale_factor, h, w)
    pred_at = _gather_stations(pred_vals, rows, cols)            # [B, T, N]
    mask = ((~jnp.isnan(values)) & station_valid[None, None, :]).astype(
        pred_at.dtype)
    if batch_mask is not None:
        mask = mask * batch_mask.astype(mask.dtype)[:, None, None]
    return pred_at, jnp.nan_to_num(values, nan=0.0), mask


def point_supervision_sums(pred: jnp.ndarray, s_coords: jnp.ndarray,
                           s_values: jnp.ndarray, scale_factor=1.0,
                           use_weighted_loss: bool = True,
                           weight_strategy: str = "log",
                           batch_mask: jnp.ndarray | None = None):
    """(weighted-abs-error sum, valid-entry count) at station pixels.

    The sum form lets eval aggregate exactly across batches (batch-size-invariant
    metrics) and lets `batch_mask` [B] zero out wrap-padded eval rows inside jit."""
    pred_at, obs, mask = _stations_pred_obs_mask(pred, s_coords, s_values,
                                                 scale_factor, batch_mask)
    weights = compute_sample_weights(obs, use_weighted_loss, weight_strategy)
    per_elem = jnp.abs(pred_at - obs) * weights * mask
    return per_elem.sum(), mask.sum()


def point_supervision_loss(pred: jnp.ndarray, s_coords: jnp.ndarray,
                           s_values: jnp.ndarray, scale_factor=1.0,
                           use_weighted_loss: bool = True,
                           weight_strategy: str = "log",
                           batch_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Masked, intensity-weighted L1 at station pixels (combined_loss.py:79-141)."""
    num, count = point_supervision_sums(pred, s_coords, s_values, scale_factor,
                                        use_weighted_loss, weight_strategy,
                                        batch_mask)
    return jnp.where(count > 0, num / jnp.maximum(count, 1), 0.0)


def _batch_mean(per_sample: jnp.ndarray, batch_mask: jnp.ndarray | None):
    """Mean of a per-sample [B] series, restricted to batch_mask when given."""
    if batch_mask is None:
        return per_sample.mean()
    m = batch_mask.astype(per_sample.dtype)
    cnt = m.sum()
    return jnp.where(cnt > 0, (per_sample * m).sum() / jnp.maximum(cnt, 1), 0.0)


def conservation_loss(pred: jnp.ndarray, lr_input: jnp.ndarray,
                      batch_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mass conservation: area-downscale pred to LR grid, L1 (combined_loss.py:64-74)."""
    from ..ops.resize import resize_area
    h_lr, w_lr = lr_input.shape[-2:]
    # [B,T,1,H,W] -> channel-last for the resize op, back after
    p = jnp.moveaxis(pred, 2, -1)                                # [B,T,H,W,1]
    p_lr = resize_area(p, h_lr, w_lr)
    err = jnp.abs(p_lr - jnp.moveaxis(lr_input, 2, -1))
    return _batch_mean(err.reshape(err.shape[0], -1).mean(axis=1), batch_mask)


def gradient_loss(pred: jnp.ndarray,
                  batch_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Spatial smoothness (combined_loss.py:146-155)."""
    gx = jnp.abs(pred[..., :, :-1] - pred[..., :, 1:])
    gy = jnp.abs(pred[..., :-1, :] - pred[..., 1:, :])
    return (_batch_mean(gx.reshape(gx.shape[0], -1).mean(axis=1), batch_mask)
            + _batch_mean(gy.reshape(gy.shape[0], -1).mean(axis=1), batch_mask))


def temporal_consistency_loss(pred: jnp.ndarray,
                              batch_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Adjacent-timestep smoothness (combined_loss.py:160-168)."""
    err = jnp.abs(pred[:, :-1] - pred[:, 1:])
    return _batch_mean(err.reshape(err.shape[0], -1).mean(axis=1), batch_mask)


def combined_loss(pred: jnp.ndarray, lr_input: jnp.ndarray, s_coords: jnp.ndarray,
                  s_values: jnp.ndarray, scale_factor=1.0,
                  lambda_point: float = 1.0, lambda_conserve: float = 1.0,
                  lambda_smooth: float = 0.1, lambda_temporal: float = 0.05,
                  use_weighted_loss: bool = True, weight_strategy: str = "log",
                  batch_mask: jnp.ndarray | None = None
                  ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total = lp*point + lc*conserve + ls*smooth + lt*temporal
    (combined_loss.py:173-191). Returns (total, component dict)."""
    loss_point = point_supervision_loss(pred, s_coords, s_values, scale_factor,
                                        use_weighted_loss, weight_strategy,
                                        batch_mask)
    loss_conserve = conservation_loss(pred, lr_input, batch_mask)
    loss_smooth = gradient_loss(pred, batch_mask)
    loss_temporal = temporal_consistency_loss(pred, batch_mask)
    total = (lambda_point * loss_point + lambda_conserve * loss_conserve
             + lambda_smooth * loss_smooth + lambda_temporal * loss_temporal)
    return total, {"point": loss_point, "conserve": loss_conserve,
                   "smooth": loss_smooth, "temporal": loss_temporal}


class CombinedLoss:
    """Object wrapper mirroring the reference constructor/call surface
    (combined_loss.py:6-18). Stateless; safe to close over in jitted functions."""

    def __init__(self, lambda_point=1.0, lambda_conserve=1.0, lambda_smooth=0.1,
                 lambda_temporal=0.05, use_weighted_loss=True, weight_strategy="log"):
        self.lambda_point = lambda_point
        self.lambda_conserve = lambda_conserve
        self.lambda_smooth = lambda_smooth
        self.lambda_temporal = lambda_temporal
        self.use_weighted_loss = use_weighted_loss
        self.weight_strategy = weight_strategy

    def __call__(self, pred, lr_input, s_coords, s_values, scale_factor=1.0):
        return combined_loss(pred, lr_input, s_coords, s_values, scale_factor,
                             self.lambda_point, self.lambda_conserve,
                             self.lambda_smooth, self.lambda_temporal,
                             self.use_weighted_loss, self.weight_strategy)


def station_sq_err_sums(pred: jnp.ndarray, s_coords: jnp.ndarray,
                        s_values: jnp.ndarray, scale_factor=1.0,
                        batch_mask: jnp.ndarray | None = None):
    """(squared-error sum, valid-entry count) at station pixels — the sum form
    of station_rmse for exact cross-batch aggregation (rmse = sqrt(num/cnt))."""
    pred_at, obs, mask = _stations_pred_obs_mask(pred, s_coords, s_values,
                                                 scale_factor, batch_mask)
    se = jnp.square(pred_at - obs) * mask
    return se.sum(), mask.sum()


def station_rmse(pred: jnp.ndarray, s_coords: jnp.ndarray, s_values: jnp.ndarray,
                 scale_factor=1.0,
                 batch_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Masked RMSE at station pixels. Unifies the gather logic the reference
    duplicates between the loss and trainer (SURVEY.md §5 'latent behaviors';
    reference trainer.py:225-272)."""
    num, count = station_sq_err_sums(pred, s_coords, s_values, scale_factor,
                                     batch_mask)
    return jnp.where(count > 0, jnp.sqrt(num / jnp.maximum(count, 1)), 0.0)
