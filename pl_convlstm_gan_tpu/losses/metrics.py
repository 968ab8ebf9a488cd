"""Categorical verification metrics for precipitation/radar nowcasting.

Standard contingency-table skill scores at intensity thresholds (the metrics the
HKO-7/SEVIR nowcasting literature reports alongside SSIM; extends the reference,
whose only metric is station RMSE — SURVEY.md §5 metrics row):

- POD  (probability of detection)       = hits / (hits + misses)
- FAR  (false alarm ratio)              = false_alarms / (hits + false_alarms)
- CSI  (critical success index)         = hits / (hits + misses + false_alarms)
- HSS  (Heidke skill score)             = 2(ad - bc) / ((a+c)(c+d) + (a+b)(b+d))

All pure XLA reductions over [..., H, W] tensors, differentiability not required."""
from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp


def contingency_counts(pred: jnp.ndarray, target: jnp.ndarray, threshold: float,
                       batch_mask: jnp.ndarray = None):
    """(hits, misses, false_alarms, correct_negatives) at a threshold.

    `batch_mask` [B] (pred/target batch-leading) restricts counting to valid
    samples — used by eval to exclude wrap-padded rows."""
    p = pred >= threshold
    t = target >= threshold
    stats = (p & t, ~p & t, p & ~t, ~p & ~t)
    if batch_mask is None:
        return tuple(jnp.sum(s) for s in stats)
    b = pred.shape[0]
    # integer accumulation: float32 loses count exactness above 2^24 pixels
    # per batch, which would break the exact cross-batch-size aggregation the
    # eval path guarantees (host sums these in float64)
    m = batch_mask.astype(jnp.int32)
    return tuple((s.reshape(b, -1).sum(axis=1) * m).sum() for s in stats)


def _safe(num, den):
    return jnp.where(den > 0, num / jnp.maximum(den, 1), 0.0)


def scores_from_counts(a, b, c, d) -> Dict[str, jnp.ndarray]:
    """POD/FAR/CSI/HSS from (hits a, false_alarms b, misses c, correct_neg d).
    Works on jnp scalars inside jit and on host floats when eval aggregates
    counts across batches."""
    pod = _safe(a, a + c)
    far = _safe(b, a + b)
    csi = _safe(a, a + b + c)
    expected = ((a + c) * (c + d) + (a + b) * (b + d))
    hss = _safe(2 * (a * d - b * c), expected)
    return {"pod": pod, "far": far, "csi": csi, "hss": hss}


def categorical_scores(pred: jnp.ndarray, target: jnp.ndarray,
                       threshold: float) -> Dict[str, jnp.ndarray]:
    a, c, b, d = contingency_counts(pred, target, threshold)  # hits,miss,fa,cn
    a, b, c, d = (jnp.asarray(x, jnp.float32) for x in (a, b, c, d))
    return scores_from_counts(a, b, c, d)


def nowcast_scores(pred: jnp.ndarray, target: jnp.ndarray,
                   thresholds: Sequence[float] = (0.5, 2.0, 5.0, 10.0, 30.0)
                   ) -> Dict[str, jnp.ndarray]:
    """{metric}@{threshold} flat dict over a set of intensity thresholds."""
    out = {}
    for th in thresholds:
        for k, v in categorical_scores(pred, target, th).items():
            out[f"{k}@{th:g}"] = v
    return out
