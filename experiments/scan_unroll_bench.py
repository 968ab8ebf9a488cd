"""Measure lax.scan unroll on the bench forecaster train step (chained timing).

Unrolling gives XLA adjacent scan iterations to fuse across (e.g. cell2 of step
t with cell1 of step t+1) at the cost of code size. Run after the round-2
ablation established the step is scan-compute-bound (~3.5 ms/scan-step).

Run: python experiments/scan_unroll_bench.py [--iters 8] [--chain 8]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from pl_convlstm_gan_tpu.utils.profiling import setup_compile_cache

setup_compile_cache()

import jax.numpy as jnp  # noqa: E402

from pl_convlstm_gan_tpu.models import ConvLSTMForecaster  # noqa: E402
from pl_convlstm_gan_tpu.train import (TrainState, make_forecaster_train_step,  # noqa: E402
                                       make_optimizer)

BATCH, T_IN, T_OUT, SIZE, HIDDEN = 4, 5, 10, 128, (64, 64)


def bench(unroll, iters, chain):
    rng = np.random.default_rng(0)
    inputs = jnp.asarray(rng.random((BATCH, T_IN, 1, SIZE, SIZE), np.float32))
    targets = jnp.asarray(rng.random((BATCH, T_OUT, 1, SIZE, SIZE), np.float32))
    model = ConvLSTMForecaster(hidden_dims=HIDDEN, input_frames=T_IN,
                               output_frames=T_OUT, dtype=jnp.bfloat16,
                               scan_unroll=unroll)
    params = model.init(jax.random.PRNGKey(0), inputs)
    tx = make_optimizer(0.5)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_forecaster_train_step(model.apply, tx)
    lr, tf, key = jnp.asarray(1e-3), jnp.asarray(0.0), jax.random.PRNGKey(1)

    from pl_convlstm_gan_tpu.utils.profiling import benchmark_chained

    def chain_step(st):
        st, _ = step(st, (inputs, targets), lr, tf, key)
        return st

    return benchmark_chained(chain_step, state, fetch=lambda s: float(s.step),
                             chain=chain, iters=iters, warmup=1)["p50"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--chain", type=int, default=8)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", file=sys.stderr)
    out = {}
    for u in (1, 2, 7):   # 7 divides the 14-step scan
        ms = bench(u, args.iters, args.chain) * 1e3
        out[f"unroll_{u}_ms"] = round(ms, 2)
        print(json.dumps({f"unroll_{u}_ms": out[f'unroll_{u}_ms']}),
              file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
