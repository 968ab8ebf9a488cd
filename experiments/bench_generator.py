"""Benchmark the parity-path Generator train step on TPU (reference workload
shapes: B8, T5, 16x16 LR -> x8 = 128x128 HR, hidden (16,32), full CombinedLoss).

Prints step time + samples/sec. Run: python experiments/bench_generator.py"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pl_convlstm_gan_tpu.utils.profiling import setup_compile_cache

setup_compile_cache()

from pl_convlstm_gan_tpu.data import SyntheticDownscalingDataset, batch_iterator
from pl_convlstm_gan_tpu.models import Generator
from pl_convlstm_gan_tpu.train import (TrainState, make_generator_train_step,
                                       make_optimizer)

LOSS_CFG = dict(lambda_point=1.0, lambda_conserve=1.0, lambda_smooth=0.1,
                lambda_temporal=0.05, use_weighted_loss=True,
                weight_strategy="log")


def main():
    ds = SyntheticDownscalingDataset(num_days=64, T=5, lr_size=16, scale_factor=8,
                                     num_stations=16, seed=0)
    model = Generator(hidden_dims=(16, 32), lu_channels=ds.num_lu_classes,
                      scale_factor=8, dtype=jnp.bfloat16)
    batch = tuple(jnp.asarray(x) for x in next(batch_iterator(ds, 8)))
    params = model.init(jax.random.PRNGKey(0), *batch[:3])
    tx = make_optimizer(0.5)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_generator_train_step(model.apply, tx, LOSS_CFG)
    lr = jnp.asarray(5e-4)

    t0 = time.perf_counter()
    state, m = step(state, batch, lr)
    print("compile+first step s", round(time.perf_counter() - t0, 1),
          "loss", float(m["total"]), flush=True)

    # steady-state (chained steps, one fetch): per-call sync timing carries
    # the ~26 ms tunnel dispatch tax, which drifts +-3-4 ms between process
    # launches — round-2 A/B runs of IDENTICAL code measured 42.2-47.5 ms
    # sync-mode, swamping real deltas. Chained timing is stable.
    from pl_convlstm_gan_tpu.utils.profiling import benchmark_chained

    def chain_step(st):
        st, _ = step(st, batch, lr)
        return st

    res = benchmark_chained(chain_step, state, fetch=lambda s: float(s.step),
                            chain=10, iters=10)
    p50 = res["p50"]
    print(f"generator train step p50 {p50 * 1e3:.2f} ms steady-state "
          f"({8 / p50:.1f} samples/s, {8 * 5 / p50:.1f} frames/s)", flush=True)


if __name__ == "__main__":
    main()
