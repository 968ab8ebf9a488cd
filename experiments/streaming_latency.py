"""Streaming-inference latency study (round 3).

Measures the operational nowcasting loop the streaming API serves
(streaming.StreamingForecaster) at the serving shape (B1, 128x128, hidden
(64, 64), bf16) on TPU:

1. ``observe``      — assimilating ONE new observation (one recurrence step);
                      the per-frame cost of keeping the stream warm.
2. re-encode        — what a stateless server pays instead per new frame:
                      the batch predictor's full T_in=5 window encode+rollout.
3. ``forecast``     — branched free-running rollouts at horizons 10 and 30:
                      XLA scan vs the warm-start VMEM-resident Pallas kernel
                      (ops/pallas/rollout_kernel.py, rollout_pallas_from_state).

Run: python experiments/streaming_latency.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from pl_convlstm_gan_tpu.utils.profiling import setup_compile_cache

setup_compile_cache()

import jax.numpy as jnp

from pl_convlstm_gan_tpu.config import Config
from pl_convlstm_gan_tpu.models import ConvLSTMForecaster
from pl_convlstm_gan_tpu.ops.pallas.rollout_kernel import (
    rollout_pallas_fits, rollout_pallas_from_state)
from pl_convlstm_gan_tpu.utils.profiling import benchmark_chained

BATCH, T_IN, T_OUT, SIZE, HIDDEN = 1, 5, 10, 128, (64, 64)


def _config() -> Config:
    return Config.from_dict({
        "data": {"source": "synthetic"},
        "model": {"family": "forecaster", "hidden_dims": list(HIDDEN),
                  "input_frames": T_IN, "output_frames": T_OUT},
        "training": {"batch_size": 8, "epochs": 1},
        "precision": {"compute_dtype": "bfloat16"},
        "output": {"output_dir": "/tmp/unused_streaming_latency"},
    })


def main():
    from pl_convlstm_gan_tpu.streaming import StreamingForecaster

    # --cells 3 runs the flagship 3-cell nowcast_128 state geometry instead;
    # --size 256 runs the config-#5 serving resolution (whose warm-start
    # budget only the streamed-I/O kernel variant fits); --io-mode forces a
    # kernel I/O variant for A/Bs where both fit
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=2, choices=(2, 3))
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--io-mode", default="auto",
                    choices=("auto", "resident", "streamed"))
    ap.add_argument("--batch-sweep", action="store_true",
                    help="measure observe/forecast at B in {1,2,4,8} "
                         "concurrent streams (round-3 VERDICT item 5)")
    args = ap.parse_args()
    global HIDDEN, SIZE
    HIDDEN = (64,) * args.cells
    SIZE = args.size

    cfg = _config()
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.random((BATCH, T_IN, 1, SIZE, SIZE)), jnp.float32)
    model = ConvLSTMForecaster(hidden_dims=HIDDEN, input_frames=T_IN,
                               output_frames=T_OUT, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), frames)

    sf = StreamingForecaster(cfg, variables)
    state0 = sf.init_state(BATCH, SIZE, SIZE)
    warm, _ = sf.observe_window(state0, frames)
    frame = frames[:, 0]

    # 1. per-frame assimilation, steady-state (state chains the calls)
    res = benchmark_chained(lambda s: sf.observe(s, frame)[0], warm,
                            fetch=lambda s: float(s.prev_out[0, 0, 0, 0]),
                            chain=20, iters=10)
    print(f"observe (1-frame assimilation): p50 {res['p50'] * 1e3:.2f} ms",
          flush=True)

    # 2. the stateless alternative: full-window re-encode + rollout per frame
    batch_fn = jax.jit(lambda p, x: model.apply(p, x))
    bres = benchmark_chained(lambda _: batch_fn(variables, frames), None,
                             fetch=lambda o: float(o[0, 0, 0, 0, 0]),
                             chain=10, iters=10)
    print(f"stateless re-encode+rollout (T_in={T_IN}, T_out={T_OUT}): "
          f"p50 {bres['p50'] * 1e3:.2f} ms", flush=True)

    # 3. branched forecasts: XLA scan vs warm-start Pallas kernel
    core_vars = sf._vars["params"]
    itemsize = jnp.dtype(jnp.bfloat16).itemsize
    for horizon in (T_OUT, 30):
        ref = sf._jit_forecast(sf._vars, warm, horizon=horizon)
        xres = benchmark_chained(
            lambda _: sf._jit_forecast(sf._vars, warm, horizon=horizon),
            None, fetch=lambda o: float(o[0, 0, 0, 0, 0]),
            chain=10, iters=10)
        line = (f"forecast h={horizon}: xla p50 {xres['p50'] * 1e3:.2f} ms")
        if jax.default_backend() == "tpu" and rollout_pallas_fits(
                1, horizon, BATCH, 1, SIZE, SIZE, HIDDEN, 3, itemsize,
                warm=True):
            pl_fn = jax.jit(lambda c, p, h=horizon: rollout_pallas_from_state(
                core_vars, c, p, h, jnp.bfloat16, io_mode=args.io_mode))
            out = pl_fn(warm.cells, warm.prev_out)
            err = float(jnp.abs(out - ref).max())
            pres = benchmark_chained(
                lambda _: pl_fn(warm.cells, warm.prev_out), None,
                fetch=lambda o: float(o[0, 0, 0, 0, 0]),
                chain=10, iters=10)
            line += (f" | pallas warm p50 {pres['p50'] * 1e3:.2f} ms "
                     f"({(1 - pres['p50'] / xres['p50']) * 100:+.1f}% vs xla,"
                     f" max|err| {err:.3e})")
        print(line, flush=True)

    # 4. multi-stream scaling: how the batch-polymorphic serving surface
    # amortizes concurrent streams (round-3 VERDICT item 5). Per-stream cost
    # should drop until the chip saturates; the kernel path runs the batch
    # as sequential grid steps, so expect ~linear there.
    if args.batch_sweep:
        horizon = 30
        for b in (1, 2, 4, 8):
            fr_b = jnp.asarray(rng.random((b, T_IN, 1, SIZE, SIZE)),
                               jnp.float32)
            warm_b, _ = sf.observe_window(sf.init_state(b, SIZE, SIZE), fr_b)
            ores = benchmark_chained(
                lambda s: sf.observe(s, fr_b[:, 0])[0], warm_b,
                fetch=lambda s: float(s.prev_out[0, 0, 0, 0]),
                chain=20, iters=10)
            xres = benchmark_chained(
                lambda _: sf._jit_forecast(sf._vars, warm_b, horizon=horizon),
                None, fetch=lambda o: float(o[0, 0, 0, 0, 0]),
                chain=10, iters=10)
            line = (f"B={b}: observe p50 {ores['p50'] * 1e3:.2f} ms | "
                    f"forecast h={horizon} xla p50 {xres['p50'] * 1e3:.2f} ms"
                    f" ({xres['p50'] * 1e3 / b:.2f} ms/stream)")
            if jax.default_backend() == "tpu" and rollout_pallas_fits(
                    1, horizon, b, 1, SIZE, SIZE, HIDDEN, 3, itemsize,
                    warm=True):
                pl_fn = jax.jit(lambda c, p: rollout_pallas_from_state(
                    core_vars, c, p, horizon, jnp.bfloat16,
                    io_mode=args.io_mode))
                pres = benchmark_chained(
                    lambda _: pl_fn(warm_b.cells, warm_b.prev_out), None,
                    fetch=lambda o: float(o[0, 0, 0, 0, 0]),
                    chain=10, iters=10)
                line += (f" | pallas p50 {pres['p50'] * 1e3:.2f} ms "
                         f"({pres['p50'] * 1e3 / b:.2f} ms/stream)")
            print(line, flush=True)


if __name__ == "__main__":
    main()
