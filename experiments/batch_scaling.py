"""Per-chip throughput vs batch size on the bench workload (chained timing).

Gives users sizing guidance: how much of the v5e's MXU headroom a bigger
per-chip batch actually buys for the 5-in/10-out 128px forecaster.

Run: python experiments/batch_scaling.py [--iters 6] [--chain 6]
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

T_IN, T_OUT, SIZE, HIDDEN = 5, 10, 128, (64, 64)


def bench(batch, iters, chain):
    rng = np.random.default_rng(0)
    inputs = jnp.asarray(rng.random((batch, T_IN, 1, SIZE, SIZE), np.float32))
    targets = jnp.asarray(rng.random((batch, T_OUT, 1, SIZE, SIZE), np.float32))
    model = ConvLSTMForecaster(hidden_dims=HIDDEN, input_frames=T_IN,
                               output_frames=T_OUT, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), inputs)
    tx = make_optimizer(0.5)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_forecaster_train_step(model.apply, tx)
    lr, tf, key = jnp.asarray(1e-3), jnp.asarray(0.0), jax.random.PRNGKey(1)

    from pl_convlstm_gan_tpu.utils.profiling import benchmark_chained

    def chain_step(st):
        st, _ = step(st, (inputs, targets), lr, tf, key)
        return st

    p50 = benchmark_chained(chain_step, state, fetch=lambda s: float(s.step),
                            chain=chain, iters=iters, warmup=1)["p50"]
    return {"p50_ms": round(p50 * 1e3, 2),
            "frames_per_sec": round(batch * T_OUT / p50, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--chain", type=int, default=6)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", file=sys.stderr)
    out = {}
    for b in (1, 2, 4, 8, 16):
        try:
            out[f"b{b}"] = bench(b, args.iters, args.chain)
        except Exception as e:   # e.g. RESOURCE_EXHAUSTED at large batches
            out[f"b{b}"] = {"error": type(e).__name__}
        print(json.dumps({f"b{b}": out[f'b{b}']}), file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
