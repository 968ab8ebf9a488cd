"""Does lax.scan(_split_transpose=True) speed up the train step?

Motivation: the round-2 attribution (docs/design.md) puts the backward pass at
~40 ms of the 51.7 ms steady-state bench step (~2x fwd FLOPs at ~40 TFLOP/s vs
fwd's 67). All *forward*-side restructurings are measured negative (split-cell
precompute, unroll, remat; round-1 kernel studies). `_split_transpose` is a
BACKWARD-side lever nobody has tried: it splits the AD-transposed scan into two
scans, giving XLA a different scheduling/fusion space for exactly the phase
that dominates.

Method: bench.py's exact headline workload (B4 5-in/10-out 128px bf16 L1 Adam
clip), chained-steps timing (one fetch), both flag values in one process.

Usage: python experiments/split_transpose_bench.py [--iters 8]

RESULT (v5e-1, 2026-08, warm cache, 8 iters):

    baseline scan            :     53.1 ms/step
    _split_transpose=True    :     53.0 ms/step (+0.0%)

Conclusion: a wash — XLA's schedule for the combined transpose scan is already
as good as the split form at these shapes; the backward's ~40 TFLOP/s is not a
scheduling artifact. Together with the forward-side studies (split-cell
precompute, unroll, remat, kernel rewrites — all negative, docs/design.md)
this closes the scan-restructuring space on BOTH passes of AD. The
`scan_split_transpose` flag stays on the model as an equivalence-tested option
(tests/test_models.py) but is not exposed in configs.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from pl_convlstm_gan_tpu.utils.profiling import setup_compile_cache

setup_compile_cache()

import jax.numpy as jnp  # noqa: E402

from pl_convlstm_gan_tpu.models import ConvLSTMForecaster  # noqa: E402
from pl_convlstm_gan_tpu.train import (TrainState, make_forecaster_train_step,  # noqa: E402
                                       make_optimizer)
from pl_convlstm_gan_tpu.utils.profiling import benchmark_chained  # noqa: E402

BATCH, T_IN, T_OUT, SIZE, HIDDEN = 4, 5, 10, 128, (64, 64)


def time_variant(split_transpose: bool, iters: int) -> float:
    rng = np.random.default_rng(0)
    inputs = jnp.asarray(rng.random((BATCH, T_IN, 1, SIZE, SIZE)).astype(np.float32))
    targets = jnp.asarray(rng.random((BATCH, T_OUT, 1, SIZE, SIZE)).astype(np.float32))
    model = ConvLSTMForecaster(hidden_dims=HIDDEN, input_frames=T_IN,
                               output_frames=T_OUT, dtype=jnp.bfloat16,
                               scan_split_transpose=split_transpose)
    params = model.init(jax.random.PRNGKey(0), inputs)
    tx = make_optimizer(0.5)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_forecaster_train_step(model.apply, tx)
    lr, tf, key = jnp.asarray(1e-3), jnp.asarray(0.0), jax.random.PRNGKey(1)

    for _ in range(2):  # compile + settle
        state, m = step(state, (inputs, targets), lr, tf, key)
        _ = float(m["total"])

    def chain_step(st):
        st, _ = step(st, (inputs, targets), lr, tf, key)
        return st

    res = benchmark_chained(chain_step, state, fetch=lambda s: float(s.step),
                            chain=max(2, iters), iters=iters, warmup=1)
    return res["p50"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    base = time_variant(False, args.iters)
    print(f"baseline scan            : {base * 1e3:8.1f} ms/step")
    split = time_variant(True, args.iters)
    print(f"_split_transpose=True    : {split * 1e3:8.1f} ms/step "
          f"({(base / split - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
