"""Inference helpers: load a trained checkpoint and run predictions.

The reference has NO inference entry point at all (zero ``torch.load`` calls,
SURVEY.md §0) — this module is the deployment-facing surface: build the model from a
config, restore the best checkpoint, and expose a jitted predict function.

Usage:
    from pl_convlstm_gan_tpu.predict import load_predictor
    predict = load_predictor(config, "output/best_model")
    hr = predict(rain_lr, dem, lu)            # generator family
    future = predict(past_frames)             # forecaster / gan families
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .config import Config
from .models import ConvLSTMForecaster, Generator
from .train.checkpoint import restore_checkpoint


def build_model(config: Config, lu_channels: int = 0,
                output_frames: int = 0):
    """Construct the (uninitialized) flax module described by a config.

    `output_frames` overrides the rollout horizon for the sequence families:
    the scan broadcasts parameters over time, so a checkpoint trained at one
    horizon drives any other at inference (e.g. train 10-out, serve 30-out)."""
    mc = config.model
    dtype = jnp.bfloat16 if config.precision.compute_dtype == "bfloat16" else None
    impl = "xla" if mc.convlstm_impl == "auto" else mc.convlstm_impl
    if mc.family in ("forecaster", "gan"):
        return ConvLSTMForecaster(
            hidden_dims=tuple(mc.hidden_dims), input_frames=mc.input_frames,
            output_frames=output_frames or mc.output_frames,
            in_channels=mc.in_channels,
            kernel_size=mc.kernel_size, convlstm_impl=impl, remat=mc.remat,
            scan_unroll=mc.scan_unroll, dtype=dtype)
    kwargs = dict(in_channels=mc.in_channels, dem_channels=mc.dem_channels,
                  hidden_dims=tuple(mc.hidden_dims),
                  lu_channels=lu_channels or mc.lu_channels,
                  kernel_size=mc.kernel_size, convlstm_impl=impl,
                  split_precompute=mc.split_precompute, dtype=dtype)
    if mc.target_grid_size:
        kwargs["target_grid_size"] = tuple(mc.target_grid_size)
    elif mc.scale_factor:
        kwargs["scale_factor"] = mc.scale_factor
    return Generator(**kwargs)


def restore_params(checkpoint_path: str):
    """Restore model params from a trainer checkpoint: ``params`` for the
    single-model families, ``gen_params`` for GAN checkpoints (the generator
    is the deployed model). The one lookup rule shared by every deployment
    surface (predict / serve / streaming)."""
    device_state, _ = restore_checkpoint(checkpoint_path)
    params = device_state.get("params", device_state.get("gen_params"))
    if params is None:
        raise ValueError(f"No params/gen_params in checkpoint {checkpoint_path}")
    return params


def build_predict_fn(config: Config, checkpoint_path: str,
                     lu_channels: int = 0, output_frames: int = 0,
                     rollout_impl: str = "") -> Callable:
    """Restore params from `checkpoint_path` and return the UNjitted predict
    closure — the single builder behind both in-process inference
    (``load_predictor``) and AOT serving export (``serve.export_model``), so
    the two deployment paths can never diverge.

    Generator family: fn(rain_lr [B,T,1,H,W], dem, lu) -> [B,T,1,H',W'].
    Forecaster/GAN:   fn(frames [B,T_in,1,H,W]) -> [B,T_out,1,H,W]."""
    model = build_model(config, lu_channels, output_frames)
    params = restore_params(checkpoint_path)

    if config.model.family in ("forecaster", "gan"):
        impl = rollout_impl or config.model.rollout_impl
        if impl == "int8":
            # post-training-quantized rollout: s8 x s8 -> s32 MXU convs, f32
            # gates (models/quantized.py). Weights quantize ONCE here; the
            # returned closure is jit-able and export-able (int8 convs are
            # plain StableHLO). Quality is a per-checkpoint property — check
            # it with experiments/int8_quality.py before deploying.
            from .models.quantized import (prepare_int8_forecaster,
                                           rollout_int8)
            q = prepare_int8_forecaster(params)
            t_out_q = output_frames or config.model.output_frames
            t_in_q = config.model.input_frames

            def fn(frames):
                if frames.shape[1] != t_in_q:
                    raise ValueError(
                        f"expected a {t_in_q}-frame input window "
                        f"(model.input_frames), got {frames.shape[1]}")
                return rollout_int8(q, frames, t_out_q)
        elif impl in ("pallas", "auto"):
            # multi-step VMEM-resident rollout kernel (whole autoregressive
            # rollout in one kernel, state never leaves VMEM — measured 28%
            # faster than the scan at the bench shape, docs/design.md).
            # "auto" falls back to the scan off-TPU or when the shape family
            # is unsupported; "pallas" raises instead of silently falling back
            from .ops.pallas.rollout_kernel import (rollout_pallas,
                                                    rollout_pallas_fits)
            t_out = output_frames or config.model.output_frames
            cdtype = (jnp.bfloat16
                      if config.precision.compute_dtype == "bfloat16"
                      else jnp.float32)

            def fn(frames):
                b, t_in, c, h, w = frames.shape
                # the kernel encodes whatever window it is given, so enforce
                # the model's input_frames contract here — the XLA path gets
                # the same check from ConvLSTMForecaster's assert, and the
                # two backends must reject wrong-length windows identically
                if t_in != config.model.input_frames:
                    raise ValueError(
                        f"expected a {config.model.input_frames}-frame input "
                        f"window (model.input_frames), got {t_in}")
                fits = rollout_pallas_fits(
                    t_in, t_out, b, c, h, w,
                    tuple(config.model.hidden_dims),
                    config.model.kernel_size, jnp.dtype(cdtype).itemsize,
                    auto=(impl == "auto"))
                if impl == "auto" and (jax.default_backend() != "tpu"
                                       or not fits):
                    return model.apply(params, frames)
                if not fits:
                    raise ValueError(
                        "rollout_impl 'pallas' does not support this shape "
                        "family (needs 2-3 equal-width cells, 3x3 kernels, "
                        "1-channel frames, lanes tiling) — use 'xla'")
                return rollout_pallas(params, frames, t_out, cdtype)
        else:
            def fn(frames):
                return model.apply(params, frames)
    else:
        input_grid_size = (tuple(config.model.input_grid_size)
                           if config.model.input_grid_size else None)

        def fn(rain_lr, dem, lu):
            kwargs = {}
            if input_grid_size is not None:
                kwargs["input_grid_size"] = input_grid_size
            return model.apply(params, rain_lr, dem, lu, **kwargs)

    return fn


def load_predictor(config: Config, checkpoint_path: str,
                   lu_channels: int = 0, output_frames: int = 0,
                   data_parallel: str = "auto") -> Callable:
    """Restore params from `checkpoint_path` and return a jitted predict fn.

    Generator family: predict(rain_lr [B,T,1,H,W], dem, lu) -> [B,T,1,H',W'].
    Forecaster/GAN:   predict(frames [B,T_in,1,H,W]) -> [B,T_out,1,H,W];
    `output_frames` serves a different rollout horizon than the checkpoint was
    trained at (recurrent params are horizon-independent).

    ``data_parallel``: batch-shard inference over every visible chip
    (throughput predict — GSPMD splits the batch; no code or collectives in
    the model's hot path, the batch dim is embarrassingly parallel).
    ``"auto"`` (default) shards when >1 device is visible AND the call's
    batch divides the device count, falling back to single-device placement
    otherwise; ``"off"`` never shards; ``"require"`` raises on a batch the
    mesh cannot split evenly instead of silently serving slower."""
    if data_parallel not in ("auto", "off", "require"):
        raise ValueError(f"data_parallel must be auto|off|require, "
                         f"got {data_parallel!r}")
    fn = build_predict_fn(config, checkpoint_path, lu_channels, output_frames)
    jfn = jax.jit(fn)
    n = jax.device_count()
    if data_parallel == "off" or n == 1:
        if data_parallel == "require" and n == 1:
            raise ValueError("data_parallel='require' needs >1 device, "
                             f"found {n}")
        return jfn

    from jax.sharding import PartitionSpec
    from .parallel import batch_sharding, make_mesh
    mesh = make_mesh()
    shard = batch_sharding(mesh)
    # shard_map, not bare GSPMD sharding: the Pallas rollout kernel (a Mosaic
    # custom call) cannot be auto-partitioned — jit would raise at lowering
    # with sharded inputs. Under shard_map each device runs the whole predict
    # program (XLA or kernel) on its local batch shard, which is exactly the
    # batch-parallel semantics wanted, and params close over as replicated.
    smapped = {}   # arg-count (1 = sequence families, 3 = generator) -> fn

    def predict(*args):
        b = args[0].shape[0]
        if b % n:
            if data_parallel == "require":
                raise ValueError(f"batch {b} not divisible by {n} devices "
                                 "(data_parallel='require')")
            return jfn(*args)
        if len(args) not in smapped:
            specs = (PartitionSpec("data"),) * len(args)
            smapped[len(args)] = jax.jit(jax.shard_map(
                fn, mesh=mesh, in_specs=specs,
                out_specs=PartitionSpec("data"), check_vma=False))
        return smapped[len(args)](
            *(jax.device_put(jnp.asarray(a), shard) for a in args))

    return predict
