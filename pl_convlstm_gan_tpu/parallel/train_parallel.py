"""Data-parallel train steps: ``shard_map`` over the mesh with explicit ``pmean``
gradient reduction over ICI.

Structure: the per-shard body computes local grads on its batch shard, all-reduces
them (``jax.lax.pmean`` over the 'data' axis — XLA compiles this to an ICI
all-reduce), then applies the (now identical) update to the replicated params.
Loss metrics are globally reduced so host logs see one exact value, and the
NaN-skip is a *global* decision — if any shard produced a non-finite loss the
whole update is dropped, keeping replicas bit-identical (the reference's
per-batch NaN skip, trainer.py:306-308, generalized to the DP setting).

The per-shard bodies ARE the single-device bodies from train/steps.py, built
with ``axis_name`` set — one implementation owns the loss/guard/update logic,
including the DP-exactness story for count-normalized terms (see
``steps.generator_step_body``: the station point term and RMSE normalize by
GLOBAL valid counts, so shards with different NaN-station patterns still
reproduce the single-device global-batch update bit-for-near-bit)."""
from __future__ import annotations

from typing import Callable, Dict

import jax
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..train.steps import (forecaster_step_body, gan_step_body,
                           generator_step_body)


def _shard_mapped(body: Callable, mesh: Mesh, axis_name: str,
                  n_batch_parts: int, n_scalar_args: int) -> Callable:
    """shard_map a step body: batch tuple sharded on ``axis_name``, state and
    scalar args replicated; jitted with the state donated."""
    rep = P()
    batch_spec = tuple([P(axis_name)] * n_batch_parts)
    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(rep, batch_spec) + (rep,) * n_scalar_args,
        out_specs=(rep, rep),
        check_vma=False)
    return jax.jit(mapped, donate_argnums=(0,))


def make_dp_generator_train_step(apply_fn: Callable,
                                 tx: optax.GradientTransformation,
                                 loss_cfg: Dict, mesh: Mesh,
                                 axis_name: str = "data",
                                 input_grid_size=None) -> Callable:
    """shard_map data-parallel version of train.steps.make_generator_train_step."""
    body = generator_step_body(apply_fn, tx, loss_cfg, input_grid_size,
                               axis_name=axis_name)
    return _shard_mapped(body, mesh, axis_name, n_batch_parts=5,
                         n_scalar_args=1)


def make_dp_forecaster_train_step(apply_fn: Callable,
                                  tx: optax.GradientTransformation, mesh: Mesh,
                                  axis_name: str = "data") -> Callable:
    """shard_map DP version of train.steps.make_forecaster_train_step (the
    scheduled-sampling rng is decorrelated across shards inside the body)."""
    body = forecaster_step_body(apply_fn, tx, axis_name=axis_name)
    return _shard_mapped(body, mesh, axis_name, n_batch_parts=2,
                         n_scalar_args=3)


def make_dp_gan_train_step(gen_apply: Callable, disc_apply: Callable,
                           gen_tx: optax.GradientTransformation,
                           disc_tx: optax.GradientTransformation, mesh: Mesh,
                           lambda_adv: float = 0.001, lambda_l1: float = 1.0,
                           axis_name: str = "data",
                           label_smoothing: float = 0.0,
                           impl: str = "default") -> Callable:
    """shard_map DP version of train.steps.make_gan_train_step: alternating D/G
    updates with pmean'd grads for both optimizers in one compiled program
    (north-star config #5: v5e-16 data-parallel GAN training).
    ``impl``: "default" | "vjp" (see train.steps.gan_step_body)."""
    body = gan_step_body(gen_apply, disc_apply, gen_tx, disc_tx, lambda_adv,
                         lambda_l1, label_smoothing, axis_name=axis_name,
                         impl=impl)
    return _shard_mapped(body, mesh, axis_name, n_batch_parts=2,
                         n_scalar_args=4)
