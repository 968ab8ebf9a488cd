"""Measure the split-cell precompute (Generator cell1 x-side conv hoisted out of
the scan as one merged (T*B) conv) vs the baseline in-scan schedule — VERDICT.md
round-1 item 3. Chained timing (one sync per K steps; see ablate_train_step.py).

Run: python experiments/split_cell_bench.py [--iters 8] [--chain 8]
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

from pl_convlstm_gan_tpu.models import Generator  # noqa: E402
from pl_convlstm_gan_tpu.train import (TrainState, make_generator_train_step,  # noqa: E402
                                       make_optimizer)

LOSS_CFG = dict(lambda_point=1.0, lambda_conserve=1.0, lambda_smooth=0.1,
                lambda_temporal=0.05, use_weighted_loss=True,
                weight_strategy="log")


def bench_case(split, b, t, lr_size, scale, hidden, iters, chain, dtype):
    rng = np.random.default_rng(0)
    rain = jnp.asarray(rng.random((b, t, 1, lr_size, lr_size), np.float32))
    dem = jnp.asarray(rng.random((b, 1, lr_size * scale, lr_size * scale),
                                 np.float32))
    lu = jnp.asarray(rng.random((b, 4, lr_size * scale, lr_size * scale),
                                np.float32))
    coords = jnp.asarray(rng.integers(0, lr_size, (8, 2)))
    vals = jnp.asarray(np.abs(rng.random((b, t, 8), np.float32)) * 10)
    batch = (rain, dem, lu, coords, vals)

    model = Generator(hidden_dims=hidden, lu_channels=4, scale_factor=scale,
                      split_precompute=split, dtype=dtype)
    params = model.init(jax.random.PRNGKey(0), rain, dem, lu)
    tx = make_optimizer(0.5)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_generator_train_step(model.apply, tx, LOSS_CFG)
    lr = jnp.asarray(1e-3)

    from pl_convlstm_gan_tpu.utils.profiling import benchmark_chained

    def chain_step(st):
        st, _ = step(st, batch, lr)
        return st

    return benchmark_chained(chain_step, state, fetch=lambda s: float(s.step),
                             chain=chain, iters=iters, warmup=1)["p50"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--chain", type=int, default=8)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", file=sys.stderr)

    cases = [
        # (name, b, t, lr_size, scale, hidden)
        ("fenhe_like_32px_x8", 8, 5, 32, 8, (16, 32)),
        ("wide_64px_x4", 4, 5, 64, 4, (64, 64)),
        ("recurrence_heavy_128px_x2", 4, 10, 128, 2, (64, 64)),
    ]
    out = {}
    for name, b, t, s, sc, hd in cases:
        base = bench_case(False, b, t, s, sc, hd, args.iters, args.chain,
                          jnp.bfloat16)
        split = bench_case(True, b, t, s, sc, hd, args.iters, args.chain,
                           jnp.bfloat16)
        out[name] = {"base_ms": round(base * 1e3, 2),
                     "split_ms": round(split * 1e3, 2),
                     "speedup_pct": round((base - split) / base * 100, 1)}
        print(json.dumps({name: out[name]}), file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
