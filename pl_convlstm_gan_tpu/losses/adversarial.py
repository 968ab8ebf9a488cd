"""Adversarial (GAN) losses: BCE-with-logits on patch logits + L1/L2 reconstruction.

North-star extension (BASELINE.json configs #2/#5: "alternating G/D steps with
BCE+L1"); the reference repo has no adversarial loss (SURVEY.md §0). Expressed as pure
XLA; numerically stable BCE via the log-sum-exp form (never materializes sigmoid)."""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Stable elementwise binary cross-entropy on logits, mean-reduced.

    BCE(x, y) = max(x, 0) - x*y + log(1 + exp(-|x|))."""
    return jnp.mean(jnp.maximum(logits, 0) - logits * targets
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - target).mean()


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.square(pred - target).mean()


def discriminator_loss(real_logits: jnp.ndarray, fake_logits: jnp.ndarray,
                       label_smoothing: float = 0.0
                       ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """D maximizes log D(real) + log(1 - D(fake)): BCE(real, 1) + BCE(fake, 0).

    One-sided label smoothing (Salimans et al. 2016): real targets become
    1 - label_smoothing, fake targets stay 0 — a standard GAN stability knob."""
    real_target = jnp.full_like(real_logits, 1.0 - label_smoothing)
    loss_real = bce_with_logits(real_logits, real_target)
    loss_fake = bce_with_logits(fake_logits, jnp.zeros_like(fake_logits))
    total = 0.5 * (loss_real + loss_fake)
    return total, {"d_real": loss_real, "d_fake": loss_fake}


def generator_adversarial_loss(fake_logits: jnp.ndarray) -> jnp.ndarray:
    """Non-saturating G loss: BCE(fake, 1)."""
    return bce_with_logits(fake_logits, jnp.ones_like(fake_logits))


def gan_generator_loss(fake_logits: jnp.ndarray, pred: jnp.ndarray,
                       target: jnp.ndarray, lambda_adv: float = 0.001,
                       lambda_l1: float = 1.0
                       ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """G total = lambda_adv * BCE(fake, 1) + lambda_l1 * L1(pred, target)."""
    adv = generator_adversarial_loss(fake_logits)
    rec = l1_loss(pred, target)
    total = lambda_adv * adv + lambda_l1 * rec
    return total, {"g_adv": adv, "g_l1": rec}
