"""Data-parallel train steps: ``shard_map`` over the mesh with explicit ``pmean``
gradient reduction over ICI.

Structure: the per-shard body computes local grads on its batch shard, all-reduces
them (``jax.lax.pmean`` over the 'data' axis — XLA compiles this to an ICI
all-reduce), then applies the (now identical) update to the replicated params. Loss
metrics are pmean'd the same way so host logs see global means. The NaN-skip is a
*global* decision — if any shard produced a non-finite loss the whole update is
dropped, keeping replicas bit-identical (the reference's per-batch NaN skip,
trainer.py:306-308, generalized to the DP setting).

These wrappers reuse the same loss/gate math as the single-device steps in
train/steps.py; only the reduction story differs."""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..losses.adversarial import discriminator_loss, gan_generator_loss, l1_loss
from ..losses.combined import combined_loss, station_rmse
from ..train.steps import (GANTrainState, TrainState, _apply_updates_dynamic_lr,
                           _select)


def _pmean_tree(tree, axis_name):
    return jax.tree_util.tree_map(lambda x: jax.lax.pmean(x, axis_name), tree)


def make_dp_generator_train_step(apply_fn: Callable,
                                 tx: optax.GradientTransformation,
                                 loss_cfg: Dict, mesh: Mesh,
                                 axis_name: str = "data",
                                 input_grid_size=None) -> Callable:
    """shard_map data-parallel version of train.steps.make_generator_train_step."""

    def loss_fn(params, rain_lr, dem, lu, s_coords, s_values):
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
        return total, (parts, pred, scale)

    def shard_body(state: TrainState, batch, lr):
        rain_lr, dem, lu, s_coords, s_values = batch
        (total, (parts, pred, scale)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, rain_lr, dem, lu,
                                   s_coords, s_values)
        # global finite-check + global grad mean over ICI
        ok = jax.lax.pmean(jnp.isfinite(total).astype(jnp.float32),
                           axis_name) >= 1.0
        grads = _pmean_tree(
            _select(ok, grads, jax.tree_util.tree_map(jnp.zeros_like, grads)),
            axis_name)
        new_params, new_opt = _apply_updates_dynamic_lr(
            tx, state.params, grads, state.opt_state, lr)
        new_state = TrainState(
            params=_select(ok, new_params, state.params),
            opt_state=_select(ok, new_opt, state.opt_state),
            step=state.step + 1)
        rmse = station_rmse(pred, s_coords, s_values, scale)
        metrics = {"total": total, "rmse": rmse,
                   "skipped": (~ok).astype(jnp.int32), **parts}
        metrics = {k: jax.lax.pmean(v.astype(jnp.float32), axis_name)
                   for k, v in metrics.items()}
        return new_state, metrics

    rep = P()
    dp = P(axis_name)
    batch_spec = (dp, dp, dp, dp, dp)
    mapped = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(rep, batch_spec, rep),
        out_specs=(rep, rep),
        check_vma=False)
    return jax.jit(mapped, donate_argnums=(0,))


def make_dp_forecaster_train_step(apply_fn: Callable,
                                  tx: optax.GradientTransformation, mesh: Mesh,
                                  axis_name: str = "data") -> Callable:
    """shard_map DP version of train.steps.make_forecaster_train_step."""

    def loss_fn(params, inputs, targets, tf_prob, rng):
        pred = apply_fn(params, inputs, targets=targets,
                        teacher_forcing_prob=tf_prob, rng=rng)
        return l1_loss(pred, targets), pred

    def shard_body(state: TrainState, batch, lr, tf_prob, rng):
        inputs, targets = batch
        # decorrelate scheduled-sampling draws across shards
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, inputs, targets, tf_prob, rng)
        ok = jax.lax.pmean(jnp.isfinite(total).astype(jnp.float32),
                           axis_name) >= 1.0
        grads = _pmean_tree(
            _select(ok, grads, jax.tree_util.tree_map(jnp.zeros_like, grads)),
            axis_name)
        new_params, new_opt = _apply_updates_dynamic_lr(
            tx, state.params, grads, state.opt_state, lr)
        new_state = TrainState(
            params=_select(ok, new_params, state.params),
            opt_state=_select(ok, new_opt, state.opt_state),
            step=state.step + 1)
        metrics = {"total": jax.lax.pmean(total, axis_name),
                   "skipped": (~ok).astype(jnp.int32)}
        return new_state, metrics

    rep = P()
    dp = P(axis_name)
    mapped = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(rep, (dp, dp), rep, rep, rep),
        out_specs=(rep, rep),
        check_vma=False)
    return jax.jit(mapped, donate_argnums=(0,))


def make_dp_gan_train_step(gen_apply: Callable, disc_apply: Callable,
                           gen_tx: optax.GradientTransformation,
                           disc_tx: optax.GradientTransformation, mesh: Mesh,
                           lambda_adv: float = 0.001, lambda_l1: float = 1.0,
                           axis_name: str = "data",
                           label_smoothing: float = 0.0) -> Callable:
    """shard_map DP version of train.steps.make_gan_train_step: alternating D/G
    updates with pmean'd grads for both optimizers in one compiled program
    (north-star config #5: v5e-16 data-parallel GAN training)."""

    def shard_body(state: GANTrainState, batch, g_lr, d_lr, tf_prob, rng):
        inputs, targets = batch
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))

        fake = gen_apply(state.gen_params, inputs, targets=targets,
                         teacher_forcing_prob=tf_prob, rng=rng)

        def d_loss_fn(dp_):
            total, parts = discriminator_loss(
                disc_apply(dp_, targets),
                disc_apply(dp_, jax.lax.stop_gradient(fake)),
                label_smoothing)
            return total, parts

        (d_total, d_parts), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.disc_params)
        d_ok = jax.lax.pmean(jnp.isfinite(d_total).astype(jnp.float32),
                             axis_name) >= 1.0
        d_grads = _pmean_tree(
            _select(d_ok, d_grads, jax.tree_util.tree_map(jnp.zeros_like, d_grads)),
            axis_name)
        new_dp, new_dopt = _apply_updates_dynamic_lr(
            disc_tx, state.disc_params, d_grads, state.disc_opt_state, d_lr)
        new_dp = _select(d_ok, new_dp, state.disc_params)
        new_dopt = _select(d_ok, new_dopt, state.disc_opt_state)

        def g_loss_fn(gp):
            fake_g = gen_apply(gp, inputs, targets=targets,
                               teacher_forcing_prob=tf_prob, rng=rng)
            total, parts = gan_generator_loss(
                disc_apply(new_dp, fake_g), fake_g, targets, lambda_adv, lambda_l1)
            return total, parts

        (g_total, g_parts), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.gen_params)
        g_ok = jax.lax.pmean(jnp.isfinite(g_total).astype(jnp.float32),
                             axis_name) >= 1.0
        g_grads = _pmean_tree(
            _select(g_ok, g_grads, jax.tree_util.tree_map(jnp.zeros_like, g_grads)),
            axis_name)
        new_gp, new_gopt = _apply_updates_dynamic_lr(
            gen_tx, state.gen_params, g_grads, state.gen_opt_state, g_lr)
        new_gp = _select(g_ok, new_gp, state.gen_params)
        new_gopt = _select(g_ok, new_gopt, state.gen_opt_state)

        new_state = GANTrainState(new_gp, new_dp, new_gopt, new_dopt,
                                  state.step + 1)
        metrics = {"d_total": d_total, "g_total": g_total,
                   "skipped": ((~d_ok) | (~g_ok)).astype(jnp.int32),
                   **d_parts, **g_parts}
        metrics = {k: jax.lax.pmean(v.astype(jnp.float32), axis_name)
                   for k, v in metrics.items()}
        return new_state, metrics

    rep = P()
    dp = P(axis_name)
    mapped = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(rep, (dp, dp), rep, rep, rep, rep),
        out_specs=(rep, rep),
        check_vma=False)
    return jax.jit(mapped, donate_argnums=(0,))
