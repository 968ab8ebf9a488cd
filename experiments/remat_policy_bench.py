"""Selective remat: can saving ONLY the conv pre-activations beat both
plain training and full remat?

Round-2 cost-model analysis (experiments/xla_cost_model.py) put the train step
near the HBM roofline with 3.3 GB of live activations; full remat was negative
(53.4 -> 79.5 ms, experiments/remat_bench.py) because it re-runs the convs.
The middle point: remat the scan body but SAVE each cell's conv pre-activation
z (jax.ad_checkpoint.checkpoint_name in ops/convlstm.py) so the backward
recomputes only the cheap elementwise gates — less stored-activation traffic
than no-remat, no conv recompute unlike full remat.

Variants: none (baseline), full (save nothing), save_z, dots (dots_saveable).
Also reports per-variant live-activation memory from the XLA cost model.

Run: python experiments/remat_policy_bench.py [--iters 8] [--chain 8]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from pl_convlstm_gan_tpu.utils.profiling import setup_compile_cache

setup_compile_cache()

import jax.numpy as jnp  # noqa: E402

from pl_convlstm_gan_tpu.models import ConvLSTMForecaster  # noqa: E402
from pl_convlstm_gan_tpu.train import (TrainState, make_forecaster_train_step,  # noqa: E402
                                       make_optimizer)
from pl_convlstm_gan_tpu.utils.profiling import (benchmark_chained,  # noqa: E402
                                                 compiled_cost)

BATCH, T_IN, T_OUT, SIZE, HIDDEN = 4, 5, 10, 128, (64, 64)


def bench(remat, policy, iters, chain):
    rng = np.random.default_rng(0)
    inputs = jnp.asarray(rng.random((BATCH, T_IN, 1, SIZE, SIZE), np.float32))
    targets = jnp.asarray(rng.random((BATCH, T_OUT, 1, SIZE, SIZE), np.float32))
    model = ConvLSTMForecaster(hidden_dims=HIDDEN, input_frames=T_IN,
                               output_frames=T_OUT, dtype=jnp.bfloat16,
                               remat=remat, remat_policy=policy)
    params = model.init(jax.random.PRNGKey(0), inputs)
    tx = make_optimizer(0.5)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_forecaster_train_step(model.apply, tx)
    lr, tf, key = jnp.asarray(1e-3), jnp.asarray(0.0), jax.random.PRNGKey(1)

    temp_mb = compiled_cost(lambda st, b: step(st, b, lr, tf, key)[0],
                            state, (inputs, targets)
                            ).get("temp_size_bytes", float("nan")) / 1e6

    def chain_step(st):
        st, _ = step(st, (inputs, targets), lr, tf, key)
        return st

    p50 = benchmark_chained(chain_step, state, fetch=lambda s: float(s.step),
                            chain=chain, iters=iters, warmup=1)["p50"]
    return p50 * 1e3, temp_mb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--chain", type=int, default=8)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", file=sys.stderr)
    out = {}
    for name, (remat, policy) in {
            "none": (False, ""), "full": (True, ""),
            "save_z": (True, "save_z"), "dots": (True, "dots")}.items():
        ms, temp = bench(remat, policy, args.iters, args.chain)
        out[name] = {"ms": round(ms, 2), "temp_mb": round(temp)}
        print(json.dumps({name: out[name]}), file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
