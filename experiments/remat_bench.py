"""Does rematerialization speed up the backward at bench shapes?

Round-2 ablation: fwd 12.2 ms vs bwd +40.1 ms — backward runs at ~60% of the
forward's TFLOP/s despite 2x the FLOPs, suggesting it is partly bound on
reading stored scan activations from HBM. remat=True recomputes the scan body
in the backward (more FLOPs, less HBM traffic): measure which wins.

Run: python experiments/remat_bench.py [--iters 8] [--chain 8]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "").lower() != "cpu":
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402

from pl_convlstm_gan_tpu.models import ConvLSTMForecaster  # noqa: E402
from pl_convlstm_gan_tpu.train import (TrainState, make_forecaster_train_step,  # noqa: E402
                                       make_optimizer)

BATCH, T_IN, T_OUT, SIZE, HIDDEN = 4, 5, 10, 128, (64, 64)


def bench(remat, iters, chain):
    rng = np.random.default_rng(0)
    inputs = jnp.asarray(rng.random((BATCH, T_IN, 1, SIZE, SIZE), np.float32()))
    targets = jnp.asarray(rng.random((BATCH, T_OUT, 1, SIZE, SIZE), np.float32()))
    model = ConvLSTMForecaster(hidden_dims=HIDDEN, input_frames=T_IN,
                               output_frames=T_OUT, dtype=jnp.bfloat16,
                               remat=remat)
    params = model.init(jax.random.PRNGKey(0), inputs)
    tx = make_optimizer(0.5)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_forecaster_train_step(model.apply, tx)
    lr, tf, key = jnp.asarray(1e-3), jnp.asarray(0.0), jax.random.PRNGKey(1)

    state, m = step(state, (inputs, targets), lr, tf, key)
    _ = float(m["total"])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(chain):
            state, m = step(state, (inputs, targets), lr, tf, key)
        _ = float(m["total"])
        times.append((time.perf_counter() - t0) / chain)
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--chain", type=int, default=8)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", file=sys.stderr)
    out = {}
    for remat in (False, True):
        ms = bench(remat, args.iters, args.chain) * 1e3
        out[f"remat_{remat}_ms"] = round(ms, 2)
        print(json.dumps({f"remat_{remat}_ms": out[f'remat_{remat}_ms']}),
              file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
