"""Rollout-latency benchmark: XLA scan rollout vs the multi-step VMEM-resident
Pallas kernel (ops/pallas/rollout_kernel.py) at the bench serving shape
(B4, 5-in/10-out, 128x128, hidden (64,64), bf16).

Round-2 VERDICT item 3: the one structurally-different Pallas variant never
tried — targets the 15.6 ms device-side rollout p50 where per-step HBM state
round-trips are pure overhead. Run: python experiments/rollout_kernel_bench.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from pl_convlstm_gan_tpu.utils.profiling import setup_compile_cache

setup_compile_cache()

import jax.numpy as jnp

from pl_convlstm_gan_tpu.models import ConvLSTMForecaster
from pl_convlstm_gan_tpu.ops.pallas.rollout_kernel import rollout_pallas

BATCH, T_IN, T_OUT, SIZE, HIDDEN = 4, 5, 10, 128, (64, 64)


def main():
    # --cells 3 [--t-out N] benches the flagship 3-cell nowcast_128 family
    # (hidden (64,64,64), default 20-out) instead of the bench serving shape;
    # --size 256 --t-out 30 --batch 1 is the config-#5 serving shape and
    # --io-mode resident|streamed forces an I/O variant (A/B both at shapes
    # where both fit; 'auto' picks resident when it fits)
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=2, choices=(2, 3))
    ap.add_argument("--t-out", type=int, default=0)
    ap.add_argument("--size", type=int, default=SIZE)
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--io-mode", default="auto",
                    choices=("auto", "resident", "streamed"))
    args = ap.parse_args()
    hidden = (64,) * args.cells
    t_out = args.t_out or (20 if args.cells == 3 else T_OUT)
    size, batch = args.size, args.batch

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.random((batch, T_IN, 1, size, size)),
                         jnp.float32)
    model = ConvLSTMForecaster(hidden_dims=hidden, input_frames=T_IN,
                               output_frames=t_out, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), frames)

    xla_fn = jax.jit(lambda p, x: model.apply(p, x))
    pl_fn = jax.jit(lambda p, x: rollout_pallas(p, x, t_out, jnp.bfloat16,
                                                io_mode=args.io_mode))
    # third contender: the int8 PTQ rollout (models/quantized.py) — s8xs8->s32
    # MXU convs; 2x the bf16 MXU rate on v5e IF XLA lowers to the int8 path
    from pl_convlstm_gan_tpu.models.quantized import (
        prepare_int8_forecaster, rollout_int8)
    qparams = prepare_int8_forecaster(params)
    i8_fn = jax.jit(lambda q, x: rollout_int8(q, x, t_out))

    # numerics first (bf16 tolerance)
    ref = xla_fn(params, frames)
    out = pl_fn(params, frames)
    err = float(jnp.abs(out - ref).max())
    print(f"max |pallas - xla| = {err:.3e} (bf16 rollout)", flush=True)
    assert err < 0.1, "rollout kernel numerics diverged"
    oi8 = i8_fn(qparams, frames)
    rel8 = float(jnp.abs(oi8 - ref).mean() / jnp.abs(ref).mean())
    print(f"int8 vs xla rel err = {rel8:.4f} (PTQ tolerance, "
          f"quality per checkpoint: experiments/int8_quality.py)", flush=True)
    assert rel8 < 0.2, "int8 rollout numerics diverged"

    # the project timing protocol for small-program A/Bs (CLAUDE.md): warm
    # EVERY contender >= 10 calls + fetch (per-program dispatch-path warmup
    # spans whole early batches), then INTERLEAVE timed batches and take
    # per-program medians so launch-to-launch drift hits both equally
    import time
    fns = (("xla scan", xla_fn, params), ("pallas multi-step", pl_fn, params),
           ("int8 scan", i8_fn, qparams))
    for _, fn, p in fns:
        for _ in range(10):
            o = fn(p, frames)
        float(o[0, 0, 0, 0, 0])
    times = {name: [] for name, _, _ in fns}
    for _ in range(10):
        for name, fn, p in fns:
            start = time.perf_counter()
            for _ in range(10):
                o = fn(p, frames)
            float(o[0, 0, 0, 0, 0])
            times[name].append((time.perf_counter() - start) / 10)
    for name, _, _ in fns:
        p50 = float(np.median(times[name]))
        fps = batch * t_out / p50
        print(f"{name}: p50 {p50 * 1e3:.2f} ms/rollout "
              f"({fps:.0f} frames/s)", flush=True)


if __name__ == "__main__":
    main()
