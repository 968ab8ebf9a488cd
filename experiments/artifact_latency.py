"""Streaming-artifact serving latency study (round 3).

Two questions, answered at the B1 online-serving shape (128x128, hidden
(64, 64), f32 — the gan_64 family, resolution raised to put device time above
the tunnel's dispatch floor):

1. Does the symbolic-batch (``jax.export`` shape-polymorphic) lowering cost
   anything device-side vs a batch-pinned export?  **Measured NO** (v5e-1,
   h=30 forecast: pinned 9.24 ms p50 vs symbolic 9.23 ms) — jax.jit refines
   the symbolic dims to the concrete request shape at trace time and XLA
   compiles the same static program. A "pin every program" artifact variant
   is therefore a pure cost (2x artifact size / export time) and was
   reverted; ``batch_polymorphic=True`` stays the default and only the
   Mosaic-kernel programs are pinned (they need a static grid).

2. How much does the embedded TPU Pallas-kernel forecast program win over
   the XLA program *through the artifact*? **-30%** (6.47 ms vs 9.24 ms p50
   at h=30; matches the in-process warm-kernel win).

METHODOLOGY WARNING (the reason this file exists): the first timing batch of
calls to any freshly-jitted program through the axon tunnel measures 10-20x
slow (per-program dispatch-path warmup, e.g. 26 ms/call that later settles
at 2 ms) and the effect persists across an entire 50-call batch. Naive
A/B runs that time program A's first batch against a warm program B report
fantasy ratios (a "25x polymorphic-batch penalty" was measured this way and
is FALSE). Always: warm every program generously (>=10 calls + fetch), then
interleave the contenders batch-by-batch and take per-program medians.

Usage: python experiments/artifact_latency.py [checkpoint_dir]
(defaults to a randomly-initialized gan_64-family checkpoint in /tmp).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from pl_convlstm_gan_tpu.utils.profiling import setup_compile_cache

setup_compile_cache()

import jax.numpy as jnp

from pl_convlstm_gan_tpu.config import load_config
from pl_convlstm_gan_tpu.serve import (export_streaming,
                                       load_streaming_exported)

SIZE, HORIZON = 128, 30


def _checkpoint(tmpdir: str) -> str:
    from pl_convlstm_gan_tpu.predict import build_model
    from pl_convlstm_gan_tpu.train.checkpoint import save_checkpoint

    config = load_config("gan_64")
    model = build_model(config)
    rng = np.random.default_rng(0)
    sample = jnp.asarray(rng.random(
        (1, config.model.input_frames, 1, SIZE, SIZE)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), sample)
    path = os.path.join(tmpdir, "artifact_latency_ckpt")
    save_checkpoint(path, {"params": params}, {"epoch": 0, "rmse": 1.0})
    return path


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else _checkpoint("/tmp")
    config = load_config("gan_64")

    # one artifact with symbolic-batch programs (+ pinned Pallas programs),
    # one with everything pinned to B1 — the pinned-vs-symbolic A/B
    poly = load_streaming_exported(export_streaming(
        config, ckpt, SIZE, SIZE, horizons=(HORIZON,)))
    pinned = load_streaming_exported(export_streaming(
        config, ckpt, SIZE, SIZE, horizons=(HORIZON,),
        batch_polymorphic=False, tpu_kernel="off"))

    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.random((1, 1, SIZE, SIZE)).astype(np.float32))
    state = poly.init_state(1)
    for _ in range(5):
        state, _ = poly.observe(state, frame)

    fns = {"pinned xla": lambda: pinned._forecasts[HORIZON](state),
           "symbolic xla": lambda: poly._forecasts[HORIZON](state)}
    if jax.default_backend() == "tpu" and HORIZON in poly._pallas_forecasts:
        fns["pallas (pinned)"] = lambda: poly._pallas_forecasts[HORIZON](state)
    fetch = lambda o: float(o[0, 0, 0, 0, 0])

    # warm every program PAST the dispatch-path warmup, then interleave
    for fn in fns.values():
        for _ in range(12):
            out = fn()
        fetch(out)
    res = {n: [] for n in fns}
    for _ in range(12):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            for _ in range(20):
                out = fn()
            fetch(out)
            res[name].append((time.perf_counter() - t0) / 20 * 1e3)
    for name, ts in res.items():
        ts = sorted(ts)
        print(f"forecast h={HORIZON} {name}: p50 {ts[len(ts) // 2]:.2f} ms | "
              f"min {ts[0]:.2f} | max {ts[-1]:.2f}", flush=True)


if __name__ == "__main__":
    main()
