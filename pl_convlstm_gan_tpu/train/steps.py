"""Jitted train/eval step builders for the three model families.

Replaces the reference's eager per-batch loop body (``/root/reference/src/training/
trainer.py:286-335``: forward, loss, NaN guard, backward, clip(0.5), Adam step, RMSE)
with single compiled step functions:

- the NaN guard becomes a branchless select: non-finite loss -> keep old params and
  optimizer state, bump a ``skipped`` counter (reference trainer.py:306-308 skips the
  batch on host);
- gradient clipping is ``optax.clip_by_global_norm`` inside the chain
  (trainer.py:311-314);
- Adam runs with the learning rate as a *dynamic* scalar argument so host-side
  ReduceLROnPlateau never recompiles the step (trainer.py:160-165);
- station RMSE is computed inside the same jit (one fused program, no extra pass —
  the reference does a second no-grad gather, trainer.py:325-329).

GAN steps (north-star): one compiled step does D update then G update (alternating
optimizers), both under the same batch; see ``make_gan_train_step``.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..losses.adversarial import discriminator_loss, gan_generator_loss, l1_loss
from ..losses.combined import combined_loss, station_rmse
from ..losses.ssim import ssim


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class GANTrainState(NamedTuple):
    gen_params: Any
    disc_params: Any
    gen_opt_state: Any
    disc_opt_state: Any
    step: jnp.ndarray


def make_optimizer(grad_clip_norm: float = 0.5) -> optax.GradientTransformation:
    """clip-by-global-norm + Adam moments; LR is applied dynamically in the step."""
    return optax.chain(optax.clip_by_global_norm(grad_clip_norm),
                       optax.scale_by_adam())


def _apply_updates_dynamic_lr(tx, params, grads, opt_state, lr):
    updates, new_opt_state = tx.update(grads, opt_state, params)
    updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
    new_params = optax.apply_updates(params, updates)
    return new_params, new_opt_state


def _select(pred_ok, new, old):
    """Branchless pytree select (the compiled NaN-skip)."""
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(pred_ok, n, o), new, old)


# --------------------------------------------------------------------------
# downscaling generator family (reference parity path)
# --------------------------------------------------------------------------

def make_generator_train_step(apply_fn: Callable, tx: optax.GradientTransformation,
                              loss_cfg: Dict, input_grid_size=None) -> Callable:
    """Returns jitted step(state, batch, lr) -> (state, metrics).

    batch = (rain_lr [B,T,1,H,W], dem, lu, s_coords, s_values)."""

    def loss_fn(params, rain_lr, dem, lu, s_coords, s_values):
        kwargs = {}
        if input_grid_size is not None:
            kwargs["input_grid_size"] = input_grid_size
        pred = apply_fn(params, rain_lr, dem, lu, **kwargs)
        # scale recomputed from shapes, as the reference does (trainer.py:300-302)
        scale = pred.shape[-2] / rain_lr.shape[-2]
        total, parts = combined_loss(
            pred, rain_lr, s_coords, s_values, scale,
            loss_cfg["lambda_point"], loss_cfg["lambda_conserve"],
            loss_cfg["lambda_smooth"], loss_cfg["lambda_temporal"],
            loss_cfg["use_weighted_loss"], loss_cfg["weight_strategy"])
        return total, (parts, pred, scale)

    def step(state: TrainState, batch, lr):
        rain_lr, dem, lu, s_coords, s_values = batch
        (total, (parts, pred, scale)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, rain_lr, dem, lu, s_coords, s_values)
        ok = jnp.isfinite(total)
        safe_grads = _select(ok, grads, jax.tree_util.tree_map(jnp.zeros_like, grads))
        new_params, new_opt = _apply_updates_dynamic_lr(
            tx, state.params, safe_grads, state.opt_state, lr)
        new_state = TrainState(
            params=_select(ok, new_params, state.params),
            opt_state=_select(ok, new_opt, state.opt_state),
            step=state.step + 1)
        rmse = station_rmse(pred, s_coords, s_values, scale)
        metrics = {"total": total, "rmse": rmse, "skipped": (~ok).astype(jnp.int32),
                   **parts}
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_generator_eval_step(apply_fn: Callable, loss_cfg: Dict,
                             input_grid_size=None) -> Callable:
    """Returns jitted eval(params, batch) -> metrics (loss + rmse), mirroring
    Trainer.validate (reference trainer.py:182-223)."""

    def evaluate(params, batch):
        rain_lr, dem, lu, s_coords, s_values = batch
        kwargs = {}
        if input_grid_size is not None:
            kwargs["input_grid_size"] = input_grid_size
        pred = apply_fn(params, rain_lr, dem, lu, **kwargs)
        scale = pred.shape[-2] / rain_lr.shape[-2]
        total, parts = combined_loss(
            pred, rain_lr, s_coords, s_values, scale,
            loss_cfg["lambda_point"], loss_cfg["lambda_conserve"],
            loss_cfg["lambda_smooth"], loss_cfg["lambda_temporal"],
            loss_cfg["use_weighted_loss"], loss_cfg["weight_strategy"])
        rmse = station_rmse(pred, s_coords, s_values, scale)
        return {"total": total, "rmse": rmse, **parts}

    return jax.jit(evaluate)


# --------------------------------------------------------------------------
# forecaster family (nowcasting; north-star configs #1/#3/#4)
# --------------------------------------------------------------------------

def make_forecaster_train_step(apply_fn: Callable, tx: optax.GradientTransformation
                               ) -> Callable:
    """step(state, batch, lr, tf_prob, rng) -> (state, metrics).
    batch = (inputs [B,T_in,1,H,W], targets [B,T_out,1,H,W]); loss = L1."""

    def loss_fn(params, inputs, targets, tf_prob, rng):
        pred = apply_fn(params, inputs, targets=targets,
                        teacher_forcing_prob=tf_prob, rng=rng)
        return l1_loss(pred, targets), pred

    def step(state: TrainState, batch, lr, tf_prob, rng):
        inputs, targets = batch
        (total, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, inputs, targets, tf_prob, rng)
        ok = jnp.isfinite(total)
        safe_grads = _select(ok, grads, jax.tree_util.tree_map(jnp.zeros_like, grads))
        new_params, new_opt = _apply_updates_dynamic_lr(
            tx, state.params, safe_grads, state.opt_state, lr)
        new_state = TrainState(
            params=_select(ok, new_params, state.params),
            opt_state=_select(ok, new_opt, state.opt_state),
            step=state.step + 1)
        metrics = {"total": total, "skipped": (~ok).astype(jnp.int32)}
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_forecaster_eval_step(apply_fn: Callable,
                              score_thresholds: Optional[Tuple[float, ...]] = None
                              ) -> Callable:
    """eval(params, batch) -> {l1, ssim, [pod/far/csi/hss@th]} on free-running
    rollout. `score_thresholds` adds categorical nowcasting skill scores."""
    from ..losses.metrics import nowcast_scores

    def evaluate(params, batch):
        inputs, targets = batch
        pred = apply_fn(params, inputs)
        out = {"l1": l1_loss(pred, targets), "ssim": ssim(pred, targets)}
        if score_thresholds:
            out.update(nowcast_scores(pred, targets, score_thresholds))
        return out

    return jax.jit(evaluate)


# --------------------------------------------------------------------------
# GAN family (north-star configs #2/#5): alternating D/G in one compiled step
# --------------------------------------------------------------------------

def make_gan_train_step(gen_apply: Callable, disc_apply: Callable,
                        gen_tx: optax.GradientTransformation,
                        disc_tx: optax.GradientTransformation,
                        lambda_adv: float = 0.001, lambda_l1: float = 1.0,
                        label_smoothing: float = 0.0) -> Callable:
    """step(state, batch, g_lr, d_lr, tf_prob, rng) -> (state, metrics).

    batch = (inputs, targets). One compiled program performs: G forward ->
    D update on (real, stop_grad(fake)) -> G update against the *updated* D."""

    def step(state: GANTrainState, batch, g_lr, d_lr, tf_prob, rng):
        inputs, targets = batch

        fake = gen_apply(state.gen_params, inputs, targets=targets,
                         teacher_forcing_prob=tf_prob, rng=rng)

        # --- D update (fake detached) ---
        def d_loss_fn(dp):
            real_logits = disc_apply(dp, targets)
            fake_logits = disc_apply(dp, jax.lax.stop_gradient(fake))
            total, parts = discriminator_loss(real_logits, fake_logits,
                                              label_smoothing)
            return total, parts

        (d_total, d_parts), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.disc_params)
        d_ok = jnp.isfinite(d_total)
        d_grads = _select(d_ok, d_grads,
                          jax.tree_util.tree_map(jnp.zeros_like, d_grads))
        new_dp, new_dopt = _apply_updates_dynamic_lr(
            disc_tx, state.disc_params, d_grads, state.disc_opt_state, d_lr)
        new_dp = _select(d_ok, new_dp, state.disc_params)
        new_dopt = _select(d_ok, new_dopt, state.disc_opt_state)

        # --- G update against updated D ---
        def g_loss_fn(gp):
            fake_g = gen_apply(gp, inputs, targets=targets,
                               teacher_forcing_prob=tf_prob, rng=rng)
            fake_logits = disc_apply(new_dp, fake_g)
            total, parts = gan_generator_loss(fake_logits, fake_g, targets,
                                              lambda_adv, lambda_l1)
            return total, parts

        (g_total, g_parts), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.gen_params)
        g_ok = jnp.isfinite(g_total)
        g_grads = _select(g_ok, g_grads,
                          jax.tree_util.tree_map(jnp.zeros_like, g_grads))
        new_gp, new_gopt = _apply_updates_dynamic_lr(
            gen_tx, state.gen_params, g_grads, state.gen_opt_state, g_lr)
        new_gp = _select(g_ok, new_gp, state.gen_params)
        new_gopt = _select(g_ok, new_gopt, state.gen_opt_state)

        new_state = GANTrainState(new_gp, new_dp, new_gopt, new_dopt, state.step + 1)
        metrics = {"d_total": d_total, "g_total": g_total,
                   "skipped": ((~d_ok) | (~g_ok)).astype(jnp.int32),
                   **d_parts, **g_parts}
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))
