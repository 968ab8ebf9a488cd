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


def contingency_counts(pred: jnp.ndarray, target: jnp.ndarray, threshold: float):
    """(hits, misses, false_alarms, correct_negatives) at a threshold."""
    p = pred >= threshold
    t = target >= threshold
    hits = jnp.sum(p & t)
    misses = jnp.sum(~p & t)
    false_alarms = jnp.sum(p & ~t)
    correct_neg = jnp.sum(~p & ~t)
    return hits, misses, false_alarms, correct_neg


def _safe(num, den):
    return jnp.where(den > 0, num / jnp.maximum(den, 1), 0.0)


def categorical_scores(pred: jnp.ndarray, target: jnp.ndarray,
                       threshold: float) -> Dict[str, jnp.ndarray]:
    a, c, b, d = contingency_counts(pred, target, threshold)  # hits,miss,fa,cn
    a, b, c, d = (x.astype(jnp.float32) for x in (a, b, c, d))
    pod = _safe(a, a + c)
    far = _safe(b, a + b)
    csi = _safe(a, a + b + c)
    expected = ((a + c) * (c + d) + (a + b) * (b + d))
    hss = _safe(2 * (a * d - b * c), expected)
    return {"pod": pod, "far": far, "csi": csi, "hss": hss}


def nowcast_scores(pred: jnp.ndarray, target: jnp.ndarray,
                   thresholds: Sequence[float] = (0.5, 2.0, 5.0, 10.0, 30.0)
                   ) -> Dict[str, jnp.ndarray]:
    """{metric}@{threshold} flat dict over a set of intensity thresholds."""
    out = {}
    for th in thresholds:
        for k, v in categorical_scores(pred, target, th).items():
            out[f"{k}@{th:g}"] = v
    return out
