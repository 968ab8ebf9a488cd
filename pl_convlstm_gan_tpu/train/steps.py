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
from ..losses.combined import (combined_loss, conservation_loss, gradient_loss,
                               point_supervision_sums, station_sq_err_sums,
                               temporal_consistency_loss)
from ..losses.ssim import ssim_per_sample


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


# -- shared single-device / data-parallel step plumbing ----------------------
# The step bodies below take ``axis_name``: None compiles the single-device
# program; a mesh axis name compiles the per-shard body for shard_map (see
# parallel/train_parallel.py). One body owns the loss/NaN-guard/update logic
# so the two paths cannot drift.

def _global_ok(total, axis_name):
    """Finite-loss check; under DP a GLOBAL decision (if any shard is
    non-finite the whole update is dropped, keeping replicas bit-identical —
    the reference's per-batch NaN skip generalized to DP)."""
    ok = jnp.isfinite(total)
    if axis_name is None:
        return ok
    return jax.lax.pmean(ok.astype(jnp.float32), axis_name) >= 1.0


def _reduced_safe_grads(grads, ok, axis_name):
    """Zero non-finite grads (branchless skip), then all-reduce under DP."""
    safe = _select(ok, grads, jax.tree_util.tree_map(jnp.zeros_like, grads))
    if axis_name is None:
        return safe
    return jax.tree_util.tree_map(
        lambda g: jax.lax.pmean(g, axis_name), safe)


def _mean_metrics(metrics: Dict, axis_name) -> Dict:
    """Per-shard metrics -> global means (host logs see one value)."""
    if axis_name is None:
        return metrics
    return {k: jax.lax.pmean(v.astype(jnp.float32), axis_name)
            for k, v in metrics.items()}


def _psum_pair(num, cnt, axis_name):
    if axis_name is None:
        return num, cnt
    return jax.lax.psum(num, axis_name), jax.lax.psum(cnt, axis_name)


def aggregate_epoch_metrics(metrics_acc) -> Dict[str, float]:
    """Host-side epoch averages over per-batch step metrics, excluding
    NaN-skipped batches (their metrics are non-finite by construction; one bad
    batch must not poison the epoch averages that drive best-checkpoint
    selection and the LR plateau — the reference skips them too,
    trainer.py:306-308). An all-skipped epoch yields NaN (honestly "no data"):
    NaN never compares as a new best and counts as a bad plateau epoch,
    whereas a 0.0 would be mistaken for a perfect new best."""
    import numpy as np
    # ONE batched device->host transfer for the whole epoch's metrics —
    # per-scalar float() would issue num_batches x num_keys blocking fetches
    # through the tunnel (each ~ms), defeating the one-sync-per-epoch design
    metrics_acc = jax.device_get(list(metrics_acc))
    stacked = {k: np.asarray([float(m[k]) for m in metrics_acc])
               for k in metrics_acc[0]}
    skipped = int(stacked["skipped"].sum())
    keep = stacked["skipped"] < 1
    if skipped:
        print(f"NaN guard: skipped {skipped} batch updates this epoch")
    avg = {k: float(v[keep].mean()) if keep.any() else float("nan")
           for k, v in stacked.items()}
    avg["skipped"] = float(skipped)
    return avg


# --------------------------------------------------------------------------
# downscaling generator family (reference parity path)
# --------------------------------------------------------------------------

def generator_step_body(apply_fn: Callable, tx: optax.GradientTransformation,
                        loss_cfg: Dict, input_grid_size=None,
                        axis_name=None) -> Callable:
    """Unjitted step(state, batch, lr) -> (state, metrics) body; shared by the
    single-device jit and the shard_map DP path (``axis_name`` set).

    batch = (rain_lr [B,T,1,H,W], dem, lu, s_coords, s_values).

    DP exactness: the point term and station RMSE normalize by mask COUNTS
    that vary across shards (NaN station observations), so a naive pmean of
    per-shard ratios diverges from the single-device global-batch semantics
    (mean-of-ratios vs ratio-of-means; for RMSE, Jensen biases the mean of
    per-shard roots low). Under DP the point term therefore scales the LOCAL
    weighted-error sum by n_shards / GLOBAL count — pmean of these per-shard
    losses (and of their grads) then equals the exact global-batch loss and
    gradient (counts carry no gradient) — and RMSE is one global
    sqrt(psum(se)/psum(cnt)). The other three terms are per-sample means
    over equal-size shards, where pmean-of-means is already exact."""

    def loss_fn(params, rain_lr, dem, lu, s_coords, s_values):
        kwargs = {}
        if input_grid_size is not None:
            kwargs["input_grid_size"] = input_grid_size
        pred = apply_fn(params, rain_lr, dem, lu, **kwargs)
        # scale recomputed from shapes, as the reference does (trainer.py:300-302)
        scale = pred.shape[-2] / rain_lr.shape[-2]
        if axis_name is None:
            total, parts = combined_loss(
                pred, rain_lr, s_coords, s_values, scale,
                loss_cfg["lambda_point"], loss_cfg["lambda_conserve"],
                loss_cfg["lambda_smooth"], loss_cfg["lambda_temporal"],
                loss_cfg["use_weighted_loss"], loss_cfg["weight_strategy"])
        else:
            p_num, p_cnt = point_supervision_sums(
                pred, s_coords, s_values, scale,
                loss_cfg["use_weighted_loss"], loss_cfg["weight_strategy"])
            n_shards = jax.lax.psum(1.0, axis_name)
            g_cnt = jax.lax.psum(p_cnt, axis_name)
            loss_point = jnp.where(
                g_cnt > 0, n_shards * p_num / jnp.maximum(g_cnt, 1.0), 0.0)
            parts = {"point": loss_point,
                     "conserve": conservation_loss(pred, rain_lr),
                     "smooth": gradient_loss(pred),
                     "temporal": temporal_consistency_loss(pred)}
            total = (loss_cfg["lambda_point"] * parts["point"]
                     + loss_cfg["lambda_conserve"] * parts["conserve"]
                     + loss_cfg["lambda_smooth"] * parts["smooth"]
                     + loss_cfg["lambda_temporal"] * parts["temporal"])
        return total, (parts, pred, scale)

    def step(state: TrainState, batch, lr):
        rain_lr, dem, lu, s_coords, s_values = batch
        (total, (parts, pred, scale)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, rain_lr, dem, lu, s_coords, s_values)
        ok = _global_ok(total, axis_name)
        safe_grads = _reduced_safe_grads(grads, ok, axis_name)
        new_params, new_opt = _apply_updates_dynamic_lr(
            tx, state.params, safe_grads, state.opt_state, lr)
        new_state = TrainState(
            params=_select(ok, new_params, state.params),
            opt_state=_select(ok, new_opt, state.opt_state),
            step=state.step + 1)
        se_num, se_cnt = _psum_pair(
            *station_sq_err_sums(pred, s_coords, s_values, scale), axis_name)
        rmse = jnp.where(se_cnt > 0,
                         jnp.sqrt(se_num / jnp.maximum(se_cnt, 1.0)), 0.0)
        metrics = {"total": total, "rmse": rmse, "skipped": (~ok).astype(jnp.int32),
                   **parts}
        return new_state, _mean_metrics(metrics, axis_name)

    return step


def make_generator_train_step(apply_fn: Callable, tx: optax.GradientTransformation,
                              loss_cfg: Dict, input_grid_size=None) -> Callable:
    """Returns jitted step(state, batch, lr) -> (state, metrics).

    batch = (rain_lr [B,T,1,H,W], dem, lu, s_coords, s_values)."""
    return jax.jit(generator_step_body(apply_fn, tx, loss_cfg, input_grid_size),
                   donate_argnums=(0,))


def make_generator_eval_step(apply_fn: Callable, loss_cfg: Dict,
                             input_grid_size=None) -> Callable:
    """Returns jitted eval(params, batch, n_valid) -> {metric: (sum, weight)}.

    Rows with index >= n_valid (wrap-padding from ``eval_batches``) carry weight
    zero INSIDE the jit, and every metric is emitted in sum form so the host can
    aggregate exactly across batches — val/test metrics are bit-identical to an
    unbatched computation regardless of batch size (round-1 eval-bias fix).
    Combine with ``aggregate_generator_eval``."""

    def evaluate(params, batch, n_valid):
        rain_lr, dem, lu, s_coords, s_values = batch
        b = rain_lr.shape[0]
        valid = jnp.arange(b) < n_valid
        nv = valid.sum().astype(jnp.float32)
        kwargs = {}
        if input_grid_size is not None:
            kwargs["input_grid_size"] = input_grid_size
        pred = apply_fn(params, rain_lr, dem, lu, **kwargs)
        scale = pred.shape[-2] / rain_lr.shape[-2]
        cfg = (loss_cfg["use_weighted_loss"], loss_cfg["weight_strategy"])
        p_num, p_cnt = point_supervision_sums(pred, s_coords, s_values, scale,
                                              *cfg, batch_mask=valid)
        se_num, se_cnt = station_sq_err_sums(pred, s_coords, s_values, scale,
                                             batch_mask=valid)
        return {
            "point": (p_num, p_cnt),
            "conserve": (conservation_loss(pred, rain_lr, valid) * nv, nv),
            "smooth": (gradient_loss(pred, valid) * nv, nv),
            "temporal": (temporal_consistency_loss(pred, valid) * nv, nv),
            "se": (se_num, se_cnt),
        }

    return jax.jit(evaluate)


def aggregate_generator_eval(metric_batches, loss_cfg: Dict
                             ) -> Optional[Dict[str, float]]:
    """Host-side exact aggregation of generator eval sums across batches."""
    if not metric_batches:
        return None
    metric_batches = jax.device_get(list(metric_batches))  # one batched fetch
    keys = metric_batches[0].keys()
    num = {k: sum(float(m[k][0]) for m in metric_batches) for k in keys}
    wt = {k: sum(float(m[k][1]) for m in metric_batches) for k in keys}
    comp = {k: (num[k] / wt[k] if wt[k] > 0 else 0.0)
            for k in ("point", "conserve", "smooth", "temporal")}
    rmse = (num["se"] / wt["se"]) ** 0.5 if wt["se"] > 0 else 0.0
    total = (loss_cfg["lambda_point"] * comp["point"]
             + loss_cfg["lambda_conserve"] * comp["conserve"]
             + loss_cfg["lambda_smooth"] * comp["smooth"]
             + loss_cfg["lambda_temporal"] * comp["temporal"])
    return {"loss": total, "rmse": rmse, **comp}


# --------------------------------------------------------------------------
# forecaster family (nowcasting; north-star configs #1/#3/#4)
# --------------------------------------------------------------------------

def forecaster_step_body(apply_fn: Callable, tx: optax.GradientTransformation,
                         axis_name=None) -> Callable:
    """Unjitted step(state, batch, lr, tf_prob, rng) -> (state, metrics) body;
    shared by the single-device jit and the shard_map DP path. The L1 loss is
    a per-sample mean over equal-size shards, so pmean of per-shard losses
    and grads is already the exact global-batch value. Under DP the
    scheduled-sampling rng is decorrelated across shards via fold_in."""

    def loss_fn(params, inputs, targets, tf_prob, rng):
        pred = apply_fn(params, inputs, targets=targets,
                        teacher_forcing_prob=tf_prob, rng=rng)
        return l1_loss(pred, targets), pred

    def step(state: TrainState, batch, lr, tf_prob, rng):
        inputs, targets = batch
        if axis_name is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        (total, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, inputs, targets, tf_prob, rng)
        ok = _global_ok(total, axis_name)
        safe_grads = _reduced_safe_grads(grads, ok, axis_name)
        new_params, new_opt = _apply_updates_dynamic_lr(
            tx, state.params, safe_grads, state.opt_state, lr)
        new_state = TrainState(
            params=_select(ok, new_params, state.params),
            opt_state=_select(ok, new_opt, state.opt_state),
            step=state.step + 1)
        metrics = {"total": total, "skipped": (~ok).astype(jnp.int32)}
        return new_state, _mean_metrics(metrics, axis_name)

    return step


def make_forecaster_train_step(apply_fn: Callable, tx: optax.GradientTransformation,
                               shardings: Optional[Tuple] = None) -> Callable:
    """step(state, batch, lr, tf_prob, rng) -> (state, metrics).
    batch = (inputs [B,T_in,1,H,W], targets [B,T_out,1,H,W]); loss = L1.

    ``shardings`` = (state_shardings, batch_sharding, replicated) jits the SAME
    single-program step with explicit placements — the GSPMD DPxTP path
    (parallel.tensor_parallel): batch sharded on 'data', cell params sharded
    on 'model', XLA inserts the gather/grad-reduction collectives. The loss
    (and hence the NaN-skip decision) is computed on the GLOBAL batch, so no
    per-shard pmean plumbing is needed."""
    step = forecaster_step_body(apply_fn, tx)

    if shardings is not None:
        state_sh, batch_sh, rep = shardings
        # out state shardings pinned to the input ones: otherwise the
        # partitioner may pick its own (e.g. head-conv grads arrive sharded
        # on the contraction dim) and the NEXT call's in_shardings mismatch
        return jax.jit(step,
                       in_shardings=(state_sh, (batch_sh, batch_sh), rep, rep,
                                     rep),
                       out_shardings=(state_sh, None),
                       donate_argnums=(0,))
    return jax.jit(step, donate_argnums=(0,))


def make_forecaster_eval_step(apply_fn: Callable,
                              score_thresholds: Optional[Tuple[float, ...]] = None,
                              sharpness: bool = False) -> Callable:
    """eval(params, batch, n_valid) -> {metric: (sum, weight)} on free-running
    rollout; wrap-padded rows (index >= n_valid) carry weight zero inside jit.
    Skill-score contingency counts ride along raw so the host computes ratios of
    GLOBAL counts, not averages of per-batch ratios. ``sharpness`` adds the
    spectral/gradient sharpness sums (losses/sharpness.py) — the metrics that
    separate blurry from sharp rollouts where L1/SSIM cannot. Combine with
    ``aggregate_sequence_eval``."""
    from ..losses.metrics import contingency_counts
    from ..losses.sharpness import sharpness_sums

    def evaluate(params, batch, n_valid):
        inputs, targets = batch
        b = inputs.shape[0]
        valid = jnp.arange(b) < n_valid
        nv = valid.sum().astype(jnp.float32)
        vm = valid.astype(jnp.float32)
        pred = apply_fn(params, inputs)
        l1_ps = jnp.abs(pred - targets).reshape(b, -1).mean(axis=1)
        ssim_ps = ssim_per_sample(pred, targets)
        out = {"l1": ((l1_ps * vm).sum(), nv), "ssim": ((ssim_ps * vm).sum(), nv)}
        for th in (score_thresholds or ()):
            hits, miss, fa, cn = contingency_counts(pred, targets, th, valid)
            out[f"counts@{th:g}"] = (jnp.stack([hits, miss, fa, cn]), nv)
        if sharpness:
            out.update(sharpness_sums(pred, targets, valid))
        return out

    return jax.jit(evaluate)


def aggregate_sequence_eval(metric_batches) -> Optional[Dict[str, float]]:
    """Host-side exact aggregation of forecaster eval sums: masked means for
    l1/ssim, POD/FAR/CSI/HSS recomputed from globally-summed contingency counts."""
    from ..losses.metrics import scores_from_counts
    if not metric_batches:
        return None
    import numpy as np
    metric_batches = jax.device_get(list(metric_batches))  # one batched fetch
    out: Dict[str, float] = {}
    for k in metric_batches[0]:
        num = sum(np.asarray(m[k][0], np.float64) for m in metric_batches)
        wt = sum(float(m[k][1]) for m in metric_batches)
        if k.startswith("counts@"):
            hits, miss, fa, cn = num
            scores = scores_from_counts(hits, fa, miss, cn)
            th = k.split("@", 1)[1]
            out.update({f"{s}@{th}": float(v) for s, v in scores.items()})
        else:
            out[k] = float(num) / wt if wt > 0 else 0.0
    # sharpness ratios from the exact global means (1.0 = target sharpness)
    for name in ("hf", "gm"):
        p, t = out.pop(f"sharp_{name}_pred", None), out.pop(f"sharp_{name}_true", None)
        if p is not None:
            out[f"sharp_{name}_ratio"] = p / t if t else float("nan")
    return out


# --------------------------------------------------------------------------
# GAN family (north-star configs #2/#5): alternating D/G in one compiled step
# --------------------------------------------------------------------------

def gan_step_body(gen_apply: Callable, disc_apply: Callable,
                  gen_tx: optax.GradientTransformation,
                  disc_tx: optax.GradientTransformation,
                  lambda_adv: float = 0.001, lambda_l1: float = 1.0,
                  label_smoothing: float = 0.0, axis_name=None,
                  impl: str = "default") -> Callable:
    """Unjitted step(state, batch, g_lr, d_lr, tf_prob, rng) -> (state,
    metrics) body; shared by the single-device jit and the shard_map DP path.
    Both GAN losses are per-sample means over equal-size shards, so pmean of
    per-shard losses/grads is the exact global-batch value. D and G each get
    their own global NaN-skip decision.

    ``impl``: "default" runs the G forward twice (once detached for the D
    update, once under value_and_grad against the updated D — the textbook
    alternating structure). "vjp" runs it ONCE under ``jax.vjp``: the D
    update consumes stop_grad(fake) and the G grad pulls the (adv + L1)
    cotangent back through the saved vjp after the D update — identical math
    (same params/rng would make the second forward bitwise-equal anyway),
    ~0.78x the modeled step FLOPs at the 256px GAN shape, at the memory cost
    of holding the G forward's residuals across the D update
    (experiments/gan256_roofline.py measures the hardware trade)."""

    def step(state: GANTrainState, batch, g_lr, d_lr, tf_prob, rng):
        inputs, targets = batch
        if axis_name is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))

        if impl == "vjp":
            fake, gen_vjp = jax.vjp(
                lambda gp: gen_apply(gp, inputs, targets=targets,
                                     teacher_forcing_prob=tf_prob, rng=rng),
                state.gen_params)
        else:
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
        d_ok = _global_ok(d_total, axis_name)
        d_grads = _reduced_safe_grads(d_grads, d_ok, axis_name)
        new_dp, new_dopt = _apply_updates_dynamic_lr(
            disc_tx, state.disc_params, d_grads, state.disc_opt_state, d_lr)
        new_dp = _select(d_ok, new_dp, state.disc_params)
        new_dopt = _select(d_ok, new_dopt, state.disc_opt_state)

        # --- G update against updated D ---
        # gradient flows to G only through its generated frames in both
        # impls (new_dp is not a function of gen_params), so the two are
        # mathematically identical
        def g_loss_from_fake(f):
            fake_logits = disc_apply(new_dp, f)
            total, parts = gan_generator_loss(fake_logits, f, targets,
                                              lambda_adv, lambda_l1)
            return total, parts

        if impl == "vjp":
            (g_total, g_parts), fbar = jax.value_and_grad(
                g_loss_from_fake, has_aux=True)(fake)
            (g_grads,) = gen_vjp(fbar)
        else:
            def g_loss_fn(gp):
                fake_g = gen_apply(gp, inputs, targets=targets,
                                   teacher_forcing_prob=tf_prob, rng=rng)
                return g_loss_from_fake(fake_g)

            (g_total, g_parts), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state.gen_params)
        g_ok = _global_ok(g_total, axis_name)
        g_grads = _reduced_safe_grads(g_grads, g_ok, axis_name)
        new_gp, new_gopt = _apply_updates_dynamic_lr(
            gen_tx, state.gen_params, g_grads, state.gen_opt_state, g_lr)
        new_gp = _select(g_ok, new_gp, state.gen_params)
        new_gopt = _select(g_ok, new_gopt, state.gen_opt_state)

        new_state = GANTrainState(new_gp, new_dp, new_gopt, new_dopt, state.step + 1)
        metrics = {"d_total": d_total, "g_total": g_total,
                   "skipped": ((~d_ok) | (~g_ok)).astype(jnp.int32),
                   **d_parts, **g_parts}
        return new_state, _mean_metrics(metrics, axis_name)

    return step


def make_gan_train_step(gen_apply: Callable, disc_apply: Callable,
                        gen_tx: optax.GradientTransformation,
                        disc_tx: optax.GradientTransformation,
                        lambda_adv: float = 0.001, lambda_l1: float = 1.0,
                        label_smoothing: float = 0.0,
                        shardings: Optional[Tuple] = None,
                        impl: str = "default") -> Callable:
    """step(state, batch, g_lr, d_lr, tf_prob, rng) -> (state, metrics).

    batch = (inputs, targets). One compiled program performs: G forward ->
    D update on (real, stop_grad(fake)) -> G update against the *updated* D.

    ``shardings`` = (state_shardings, batch_sharding, replicated): the GSPMD
    DPxTP path — G's cells channel-sharded on 'model', D replicated over it,
    batch on 'data' (see make_forecaster_train_step).

    ``impl``: "default" | "vjp" (one-forward restructure — gan_step_body)."""
    step = gan_step_body(gen_apply, disc_apply, gen_tx, disc_tx, lambda_adv,
                         lambda_l1, label_smoothing, impl=impl)

    if shardings is not None:
        state_sh, batch_sh, rep = shardings
        return jax.jit(step,
                       in_shardings=(state_sh, (batch_sh, batch_sh), rep, rep,
                                     rep, rep),
                       out_shardings=(state_sh, None),
                       donate_argnums=(0,))
    return jax.jit(step, donate_argnums=(0,))
