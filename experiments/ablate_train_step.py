"""Per-phase ablation of the headline bench train step (VERDICT.md round-1 item 2).

The jax.profiler hangs through the axon tunnel (CLAUDE.md), so attribution is done
by ablation timing. Two timing modes per program:

- SYNC:    each call is timed with a scalar fetch (what bench.py r1 did) — includes
           the full per-call dispatch + tunnel-sync overhead.
- CHAINED: K dependent calls, ONE final scalar fetch, per-call = total/K — the
           steady-state throughput a real training loop sees (no per-step sync).

The difference between the two isolates the fixed per-call overhead and explains
the round-1 "54ms fwd / +28ms bwd" anomaly: if overhead is large, a forward-only
measurement is dominated by it, making forward look artificially expensive
relative to the backward *increment*.

Programs ablated (all on the bench workload: B4, 5-in/10-out, 128^2, hidden 64x64,
bf16 compute):
  null       - trivial jitted fn (pure overhead)
  fwd        - model forward + L1 loss (no grad)
  fwd_bwd    - value_and_grad (no optimizer)
  full_step  - the real train step (grad + clip + adam + NaN-guard)
  rollout    - inference rollout (no loss)
  encode/decode split via T_out ablation: full_step at T_out=1 vs T_out=10

Run: python experiments/ablate_train_step.py [--iters 10] [--chain 10]
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


def time_sync(fn, fetch, iters):
    """Median seconds per call, scalar-fetch sync every call."""
    fetch(fn())
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn())
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def time_chained(step_fn, state0, fetch_state, chain, iters):
    """Median seconds per call, K dependent calls + one final fetch (shared
    implementation: utils.profiling.benchmark_chained)."""
    from pl_convlstm_gan_tpu.utils.profiling import benchmark_chained
    res = benchmark_chained(step_fn, state0, fetch=fetch_state, chain=chain,
                            iters=iters, warmup=1)
    return res["p50"], res["state"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--chain", type=int, default=10)
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    inputs = jnp.asarray(rng.random((BATCH, T_IN, 1, SIZE, SIZE), np.float32))
    targets = jnp.asarray(rng.random((BATCH, T_OUT, 1, SIZE, SIZE), np.float32))

    model = ConvLSTMForecaster(hidden_dims=HIDDEN, input_frames=T_IN,
                               output_frames=T_OUT, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), inputs)
    tx = make_optimizer(0.5)
    lr, tf, key = jnp.asarray(1e-3), jnp.asarray(0.0), jax.random.PRNGKey(1)
    results = {}

    # --- null: pure dispatch+sync overhead
    null = jax.jit(lambda x: x.sum() * 0 + 1.0)
    results["null_sync"] = time_sync(lambda: null(lr), float, args.iters)

    # --- rollout (inference)
    infer = jax.jit(model.apply)
    results["rollout_sync"] = time_sync(
        lambda: infer(params, inputs), lambda o: float(o[0, 0, 0, 0, 0]),
        args.iters)

    # --- fwd: forward + loss
    def loss_fn(p):
        pred = model.apply(p, inputs, targets=targets, teacher_forcing_prob=tf,
                           rng=key)
        return jnp.abs(pred - targets).mean()
    fwd = jax.jit(loss_fn)
    results["fwd_sync"] = time_sync(lambda: fwd(params), float, args.iters)

    # --- fwd+bwd: value_and_grad, reduce grads to one scalar to fetch
    vg = jax.jit(lambda p: jax.tree_util.tree_reduce(
        lambda a, x: a + x.sum(), jax.value_and_grad(loss_fn)(p)[1],
        jnp.zeros(())))
    results["fwd_bwd_sync"] = time_sync(lambda: vg(params), float, args.iters)

    # --- full step, sync mode (exactly what bench.py r1 measured)
    # the step donates its state — seed it with COPIES so `params` stays alive
    # for the rollout sections below
    step = make_forecaster_train_step(model.apply, tx)
    pcopy = jax.tree_util.tree_map(jnp.copy, params)
    state = TrainState(pcopy, tx.init(pcopy), jnp.zeros((), jnp.int32))

    def run_step(st):
        st, m = step(st, (inputs, targets), lr, tf, key)
        return st, m
    st, m = run_step(state)
    _ = float(m["total"])
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        st, m = run_step(st)
        _ = float(m["total"])
        times.append(time.perf_counter() - t0)
    results["full_step_sync"] = float(np.median(times))

    # --- full step, chained mode (steady-state throughput)
    def chain_step(st):
        st, _ = step(st, (inputs, targets), lr, tf, key)
        return st
    per, st = time_chained(chain_step, st, lambda s: float(s.step), args.chain,
                           args.iters)
    results["full_step_chained"] = per

    # --- rollout, chained (use output as carrier via trivial dependency)
    def chain_roll(carry):
        out = infer(params, inputs)
        return out
    out = infer(params, inputs)
    _ = float(out[0, 0, 0, 0, 0])
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        outs = [infer(params, inputs) for _ in range(args.chain)]
        _ = float(outs[-1][0, 0, 0, 0, 0])
        times.append((time.perf_counter() - t0) / args.chain)
    results["rollout_chained"] = float(np.median(times))

    # --- T_out ablation: encode-vs-decode split of the full step
    for t_out in (1, 5):
        m2 = ConvLSTMForecaster(hidden_dims=HIDDEN, input_frames=T_IN,
                                output_frames=t_out, dtype=jnp.bfloat16)
        p2 = m2.init(jax.random.PRNGKey(0), inputs)
        tg2 = targets[:, :t_out]
        step2 = make_forecaster_train_step(m2.apply, tx)  # donates st2 (fresh)
        st2 = TrainState(p2, tx.init(p2), jnp.zeros((), jnp.int32))

        def chain2(s):
            s, _ = step2(s, (inputs, tg2), lr, tf, key)
            return s
        per2, _ = time_chained(chain2, st2, lambda s: float(s.step),
                               args.chain, args.iters)
        results[f"full_step_chained_tout{t_out}"] = per2

    # derived attribution
    results["derived"] = {
        "per_call_overhead_ms": round(results["null_sync"] * 1e3, 2),
        "fwd_compute_ms": round(
            (results["fwd_sync"] - results["null_sync"]) * 1e3, 2),
        "bwd_increment_ms": round(
            (results["fwd_bwd_sync"] - results["fwd_sync"]) * 1e3, 2),
        "opt_increment_ms": round(
            (results["full_step_sync"] - results["fwd_bwd_sync"]) * 1e3, 2),
        "sync_tax_per_step_ms": round(
            (results["full_step_sync"] - results["full_step_chained"]) * 1e3, 2),
        "frames_per_sec_chained": round(
            BATCH * T_OUT / results["full_step_chained"], 1),
        "frames_per_sec_sync": round(
            BATCH * T_OUT / results["full_step_sync"], 1),
    }
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
