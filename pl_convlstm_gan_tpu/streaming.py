"""Streaming (stateful) inference for the sequence families.

The batch predict path (``predict.load_predictor``) re-runs the full
``input_frames`` encode for every forecast. An operational nowcasting service
sees a different access pattern: ONE new observation arrives per time step,
and forecasts of any horizon branch from the current assimilated state.
``StreamingForecaster`` serves that pattern directly — the stacked ConvLSTM
``(h, c)`` state lives in a device-resident pytree carried across jitted
calls, so assimilating a new frame costs one recurrence step instead of
``input_frames``, and a horizon-``n`` forecast is a pure function of the
current state (branching never corrupts the assimilation stream).

The reference has no inference entry point at all (zero ``torch.load`` calls,
SURVEY.md §0/§5) — this module, like ``predict``/``serve``, is deployment
surface the TPU build adds. TPU-first notes: state stays on device between
calls (only frames cross the host boundary), the per-horizon forecast scan is
one compiled ``lax.scan`` program cached per ``horizon``, and compute runs in
the config's precision policy (bf16 state/compute under ``bfloat16``).

Parity contract (pinned in ``tests/test_streaming.py``): observing the
training window and forecasting ``T_out - 1`` more steps reproduces the batch
``ConvLSTMForecaster`` rollout exactly::

    state = sf.init_state(B, H, W)
    state, nowcast = sf.observe_window(state, frames)     # frames [B,T_in,C,H,W]
    rest = sf.forecast(state, t_out - 1)
    rollout = jnp.concatenate([nowcast[:, None], rest], axis=1)
    # rollout == ConvLSTMForecaster(...).apply(params, frames)
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .config import Config
from .models.forecaster import _StackedStepCore


class StreamState(NamedTuple):
    """Device-resident recurrent state (an opaque pytree to callers).

    ``cells``: per-layer ``(h, c)`` pairs, each ``[B, H, W, features]`` NHWC.
    ``prev_out``: the model's latest emitted frame ``[B, H, W, C]`` — the
    autoregressive input for the next decode step."""
    cells: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]
    prev_out: jnp.ndarray


def _to_nhwc_seq(frames):
    """[B, T, C, H, W] -> time-major [T, B, H, W, C]."""
    return jnp.transpose(frames, (1, 0, 3, 4, 2))


class StreamingForecaster:
    """Stateful online inference over a forecaster/GAN-generator checkpoint.

    Construct from in-memory variables (``StreamingForecaster(config, vars)``)
    or a checkpoint (``StreamingForecaster.from_checkpoint(config, path)``).
    All methods are pure: they return new states and never mutate inputs, so
    a caller may hold multiple branches of the same stream.
    """

    def __init__(self, config: Config, variables):
        mc = config.model
        if mc.family not in ("forecaster", "gan"):
            raise ValueError(
                f"streaming inference needs a sequence family "
                f"(forecaster/gan), got {mc.family!r}")
        self._hidden = tuple(mc.hidden_dims)
        self._channels = mc.in_channels
        self._cdtype = (jnp.bfloat16
                        if config.precision.compute_dtype == "bfloat16"
                        else jnp.float32)
        # the scan body module of ConvLSTMForecaster: nn.scan broadcasts
        # params, so checkpoint params under "core" apply to the bare step
        # module unchanged (same names: cell_<i>, head)
        self._core = _StackedStepCore(
            hidden_dims=self._hidden, out_channels=mc.in_channels,
            kernel_size=mc.kernel_size,
            impl="xla" if mc.convlstm_impl == "auto" else mc.convlstm_impl,
            dtype=self._cdtype, param_dtype=jnp.float32)
        self._vars = {"params": variables["params"]["core"]}
        self._kernel_size = mc.kernel_size
        self._rollout_impl = mc.rollout_impl
        # params enter as a jit ARGUMENT (not a closure constant) so weights
        # are device buffers, not constants baked into the executable.
        # Every public entry is ONE jitted dispatch — layout transposes,
        # casts, and (for the Pallas branch) weight repacking are traced into
        # the compiled program, never eagerly dispatched per call.
        self._jit_observe = jax.jit(self._observe_seq)
        self._jit_observe_one = jax.jit(
            lambda v, s, f: self._observe_seq(v, s, f[:, None]))
        self._jit_forecast = jax.jit(self._forecast_scan,
                                     static_argnames="horizon")
        self._jit_forecast_pallas = None    # built on first TPU-kernel use
        self._jit_forecast_int8 = None      # built on first int8 forecast

    @classmethod
    def from_checkpoint(cls, config: Config, checkpoint_path: str
                        ) -> "StreamingForecaster":
        from .predict import restore_params
        return cls(config, restore_params(checkpoint_path))

    # -- state -----------------------------------------------------------
    def init_state(self, batch_size: int, height: int, width: int
                   ) -> StreamState:
        """Fresh zero state (matches the batch model's zero-init carry)."""
        zeros = lambda f: jnp.zeros((batch_size, height, width, f),
                                    self._cdtype)
        cells = tuple((zeros(f), zeros(f)) for f in self._hidden)
        return StreamState(cells, zeros(self._channels))

    # -- jitted bodies ----------------------------------------------------
    def _step(self, core_vars, carry, frame_nhwc, use_frame: bool):
        b = frame_nhwc.shape[0]
        flags = jnp.full((b,), use_frame, bool)
        no_teacher = jnp.zeros((b,), bool)
        (cells, prev), out = self._core.apply(
            core_vars, carry,
            (frame_nhwc, flags, jnp.zeros_like(frame_nhwc), no_teacher))
        return (cells, prev), out

    def _observe_seq(self, core_vars, state: StreamState, frames_btchw):
        seq = _to_nhwc_seq(frames_btchw).astype(self._cdtype)

        def body(carry, frame):
            carry, _ = self._step(core_vars, carry, frame, True)
            return carry, None

        carry, _ = jax.lax.scan(body, (state.cells, state.prev_out), seq)
        cells, prev = carry
        nowcast = jnp.transpose(prev, (0, 3, 1, 2)).astype(jnp.float32)
        return StreamState(cells, prev), nowcast

    def _forecast_scan(self, core_vars, state: StreamState, horizon: int):
        dummy = jnp.zeros_like(state.prev_out)

        def body(carry, _):
            carry, out = self._step(core_vars, carry, dummy, False)
            return carry, out

        _, outs = jax.lax.scan(body, (state.cells, state.prev_out),
                               None, length=horizon)
        return jnp.transpose(outs, (1, 0, 4, 2, 3)).astype(jnp.float32)

    # -- AOT export hooks (serve.export_streaming) -------------------------
    # exported callables use PLAIN nested tuples for the state (not the
    # StreamState NamedTuple): jax.export must serialize the input/output
    # pytree structure, and builtin containers round-trip it portably
    def export_observe_fn(self):
        """``(state_tuple, frame [B,C,H,W]) -> (state_tuple, nowcast)`` with
        params closed over (baked into the exported artifact)."""
        def fn(state_tuple, frame):
            cells, prev = state_tuple
            new, now = self._observe_seq(
                self._vars, StreamState(tuple(cells), prev), frame[:, None])
            return (tuple(new.cells), new.prev_out), now
        return fn

    def export_forecast_fn(self, horizon: int):
        """``state_tuple -> forecast [B, horizon, C, H, W]`` (pure branch)."""
        def fn(state_tuple):
            cells, prev = state_tuple
            return self._forecast_scan(self._vars,
                                       StreamState(tuple(cells), prev),
                                       horizon)
        return fn

    def export_forecast_int8_fn(self, horizon: int):
        """QUANTIZED portable variant of ``export_forecast_fn``
        (``rollout_impl: int8``): the int8 decode (models/quantized.py) is
        plain StableHLO, so unlike the Mosaic kernel it exports for TPU+CPU
        with a symbolic batch; weights quantize at trace time INTO the
        artifact. Observe programs stay float by design (assimilation is one
        step per frame and sets the state every branch depends on)."""
        from .models.quantized import (prepare_int8_forecaster,
                                       rollout_int8_from_state)
        q = prepare_int8_forecaster({"params": {"core": self._vars["params"]}})

        def fn(state_tuple):
            cells, prev = state_tuple
            return rollout_int8_from_state(q, prev, tuple(cells), horizon)[0]
        return fn

    def pallas_forecast_fits(self, batch: int, height: int, width: int,
                             horizon: int, auto: bool = False) -> bool:
        """Whether the warm-start Pallas rollout kernel supports this shape
        family (2-3 equal-width cells, 3x3 kernels, 1-channel frames, lane
        tiling, VMEM budget — ops/pallas/rollout_kernel.py). ``auto=True``
        restricts to the on-device-validated cell counts."""
        from .ops.pallas.rollout_kernel import rollout_pallas_fits
        return rollout_pallas_fits(
            1, horizon, batch, self._channels, height, width, self._hidden,
            self._kernel_size, jnp.dtype(self._cdtype).itemsize, warm=True,
            auto=auto)

    def export_forecast_pallas_fn(self, horizon: int):
        """TPU-only variant of ``export_forecast_fn``: the warm-start
        VMEM-resident Pallas rollout kernel (a Mosaic custom call) instead of
        the portable XLA scan. ``interpret=False`` is forced so cross-platform
        export from a CPU-only host still captures the compiled kernel."""
        from .ops.pallas.rollout_kernel import rollout_pallas_from_state

        def fn(state_tuple):
            cells, prev = state_tuple
            return rollout_pallas_from_state(
                self._vars["params"], tuple(cells),
                prev, horizon, self._cdtype, interpret=False)
        return fn

    def export_meta(self) -> dict:
        """Static state geometry a serving process needs to zero-init a
        stream without any model code (serve.load_streaming_exported)."""
        return {"hidden": list(self._hidden), "channels": self._channels,
                "dtype": ("bfloat16" if self._cdtype == jnp.bfloat16
                          else "float32")}

    # -- public API --------------------------------------------------------
    def observe_window(self, state: StreamState, frames
                       ) -> Tuple[StreamState, jnp.ndarray]:
        """Assimilate ``frames [B, T, C, H, W]``; returns ``(new_state,
        nowcast [B, C, H, W])`` — the 1-step-ahead prediction issued from the
        last observed frame (the batch rollout's first output frame)."""
        return self._jit_observe(self._vars, state, jnp.asarray(frames))

    def observe(self, state: StreamState, frame
                ) -> Tuple[StreamState, jnp.ndarray]:
        """Assimilate one frame ``[B, C, H, W]``; returns ``(new_state,
        nowcast [B, C, H, W])``."""
        return self._jit_observe_one(self._vars, state, jnp.asarray(frame))

    def forecast(self, state: StreamState, horizon: int) -> jnp.ndarray:
        """Free-running rollout of ``horizon`` frames ``[B, horizon, C, H, W]``
        beyond the state's nowcast, without touching ``state`` (pure branch).
        The full ``T_out``-frame batch rollout is ``nowcast`` from the last
        observe plus ``forecast(state, T_out - 1)``. Compiles once per
        distinct ``horizon``. On TPU, supported shape families
        (``model.rollout_impl`` auto/pallas) run the warm-start VMEM-resident
        Pallas rollout kernel — the multi-step decode stays entirely on-core
        (ops/pallas/rollout_kernel.py)."""
        if horizon < 1:
            raise ValueError(f"horizon must be >= 1, got {horizon}")
        if self._rollout_impl == "int8":
            # quantized decode (models/quantized.py): the forecast scan is the
            # hot path (horizon MXU conv steps); assimilation (observe) stays
            # float — it is one step per new frame and sets the state the
            # whole stream depends on. Weights quantize once, lazily.
            if self._jit_forecast_int8 is None:
                from .models.quantized import (prepare_int8_forecaster,
                                               rollout_int8_from_state)
                q = prepare_int8_forecaster(
                    {"params": {"core": self._vars["params"]}})
                self._jit_forecast_int8 = jax.jit(
                    lambda qt, prev, cells, horizon:
                    rollout_int8_from_state(qt, prev, cells, horizon)[0],
                    static_argnames="horizon"), q
            fn, q = self._jit_forecast_int8
            return fn(q, state.prev_out, state.cells, horizon=horizon)
        if self._rollout_impl in ("pallas", "auto"):
            from .ops.pallas.rollout_kernel import rollout_pallas_from_state
            b, h, w, _ = state.prev_out.shape
            fits = self.pallas_forecast_fits(
                b, h, w, horizon, auto=(self._rollout_impl == "auto"))
            if self._rollout_impl == "pallas" and not fits:
                raise ValueError(
                    "rollout_impl 'pallas' does not support this "
                    "shape/horizon (needs 2-3 equal-width cells, 3x3 "
                    "kernels, 1-channel frames, lanes tiling, and the "
                    "batch's packed state + scratch within the VMEM "
                    "budget) — use 'xla' or a smaller batch/horizon")
            if fits and (jax.default_backend() == "tpu"
                         or self._rollout_impl == "pallas"):
                if self._jit_forecast_pallas is None:
                    # ONE dispatch per call: weight repacking + state packing
                    # compile into the program (cached per horizon)
                    self._jit_forecast_pallas = jax.jit(
                        lambda core, cells, prev, horizon:
                        rollout_pallas_from_state(
                            core, cells, prev, horizon, self._cdtype),
                        static_argnames="horizon")
                return self._jit_forecast_pallas(
                    self._vars["params"], state.cells, state.prev_out,
                    horizon=horizon)
        return self._jit_forecast(self._vars, state, horizon=horizon)
