"""Serving-path overhead: exported (jax.export/StableHLO) artifact vs direct jit.

Validates the production-serving story on real hardware: the AOT artifact must
(a) execute on TPU bit-exactly vs in-process `model.apply`, and (b) add no
per-call overhead. Measured v5e-1 (2026-08, warm cache):

    direct jit       : 19.5 ms/call (pipelined, B4 5-in/10-out 128px rollout)
    exported symbolic: 19.4 ms/call   <- batch-polymorphic artifact
    exported static  : 19.5 ms/call
    max |err| vs direct apply: 0.0

i.e. serving through the portable artifact is free; use it everywhere.
(Timing note: K back-to-back calls with one trailing fetch — per-call sync
through the axon tunnel adds ~26 ms of pure dispatch, see
experiments/ablate_train_step.py.)

Usage: python experiments/export_serving_bench.py [--iters 30]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from pl_convlstm_gan_tpu.utils.profiling import setup_compile_cache

setup_compile_cache()

import jax.numpy as jnp  # noqa: E402
from jax import export as jx  # noqa: E402

from pl_convlstm_gan_tpu.models import ConvLSTMForecaster  # noqa: E402
from pl_convlstm_gan_tpu.serve import load_exported  # noqa: E402

BATCH, T_IN, T_OUT, SIZE, HIDDEN = 4, 5, 10, 128, (64, 64)


def timeit(f, x, iters):
    o = f(x)
    _ = float(o.mean())  # warm + full-pipeline sync
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(x)
    _ = float(o.mean())
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    m = ConvLSTMForecaster(hidden_dims=HIDDEN, input_frames=T_IN,
                           output_frames=T_OUT)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((BATCH, T_IN, 1, SIZE, SIZE)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    fn = jax.jit(lambda frames: m.apply(params, frames))

    (b,) = jx.symbolic_shape("b")
    sym = jax.ShapeDtypeStruct((b,) + x.shape[1:], x.dtype)
    sta = jax.ShapeDtypeStruct(x.shape, x.dtype)
    platforms = ("cpu",) if jax.default_backend() == "cpu" else ("tpu", "cpu")
    serve_sym = load_exported(bytes(jx.export(fn, platforms=platforms)(sym).serialize()))
    serve_sta = load_exported(bytes(jx.export(fn, platforms=platforms)(sta).serialize()))

    err = float(jnp.abs(serve_sym(x) - fn(x)).max())
    print(f"max |err| exported vs direct apply: {err:.2e}")
    print(f"direct jit       : {timeit(fn, x, args.iters):6.1f} ms/call")
    print(f"exported symbolic: {timeit(serve_sym, x, args.iters):6.1f} ms/call")
    print(f"exported static  : {timeit(serve_sta, x, args.iters):6.1f} ms/call")


if __name__ == "__main__":
    main()
