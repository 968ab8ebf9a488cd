"""Benchmark harness — prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline workload (BASELINE.json): train-step throughput in frames/sec/chip for
10-frame 128x128 rollouts (ConvLSTM forecaster, 5-in/10-out, batch 4, L1 loss, Adam,
grad clip). ``vs_baseline`` is the speedup over an equivalent PyTorch model's train
step on CPU (the reference's only execution mode — it has no GPU/TPU code path and
publishes no numbers; BASELINE.md). The torch baseline is measured once and cached in
``bench_baseline_cache.json``.

Usage: python bench.py            (full benchmark, one JSON line on stdout)
       python bench.py --quick    (fewer iters; for smoke-testing the harness)
"""
import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
CACHE_PATH = os.path.join(HERE, "bench_baseline_cache.json")

# headline workload
BATCH = 4
T_IN, T_OUT = 5, 10
SIZE = 128
HIDDEN = (64, 64)


def bench_jax(iters: int) -> dict:
    import jax
    from pl_convlstm_gan_tpu.utils.profiling import setup_compile_cache
    setup_compile_cache()
    import jax.numpy as jnp
    from pl_convlstm_gan_tpu.models import ConvLSTMForecaster
    from pl_convlstm_gan_tpu.train import (TrainState, make_forecaster_train_step,
                                           make_optimizer)

    rng = np.random.default_rng(0)
    inputs = jnp.asarray(rng.random((BATCH, T_IN, 1, SIZE, SIZE)).astype(np.float32))
    targets = jnp.asarray(rng.random((BATCH, T_OUT, 1, SIZE, SIZE)).astype(np.float32))

    model = ConvLSTMForecaster(hidden_dims=HIDDEN, input_frames=T_IN,
                               output_frames=T_OUT, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), inputs)
    tx = make_optimizer(0.5)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_forecaster_train_step(model.apply, tx)

    lr = jnp.asarray(1e-3)
    tf = jnp.asarray(0.0)
    key = jax.random.PRNGKey(1)

    # warmup/compile; float() fetch is the reliable full-pipeline sync through
    # the axon tunnel (block_until_ready alone under-reports there)
    for _ in range(2):
        state, m = step(state, (inputs, targets), lr, tf, key)
        _ = float(m["total"])

    # THROUGHPUT (headline): steady-state — a real training loop does NOT sync
    # per step, so time CHAIN dependent steps with ONE final scalar fetch
    # (utils.profiling.benchmark_chained). Per-call host sync costs ~26 ms
    # through the axon tunnel (measured in experiments/ablate_train_step.py);
    # per-step timing would charge that dispatch tax to every step and
    # under-report throughput by ~35%.
    from pl_convlstm_gan_tpu.utils.profiling import benchmark_chained
    chain = max(2, iters)

    def chain_step(st):
        st, _ = step(st, (inputs, targets), lr, tf, key)
        return st

    res = benchmark_chained(chain_step, state, fetch=lambda s: float(s.step),
                            chain=chain, iters=iters, warmup=1)
    p50, state = res["p50"], res["state"]

    # per-step sync mode kept for reference (what round-1 reported)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        state, m = step(state, (inputs, targets), lr, tf, key)
        _ = float(m["total"])
        times.append(time.perf_counter() - t0)
    p50_sync = float(np.median(times))

    # inference p50 latency of a free-running 10-frame rollout: device-side
    # latency via back-to-back calls (one fetch), host-observed incl. sync too
    infer = jax.jit(lambda p, x: model.apply(p, x))
    ires = benchmark_chained(lambda _: infer(state.params, inputs), None,
                             fetch=lambda o: float(o[0, 0, 0, 0, 0]),
                             chain=chain, iters=iters, warmup=1)
    itimes_sync = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = infer(state.params, inputs)
        _ = float(out[0, 0, 0, 0, 0])
        itimes_sync.append(time.perf_counter() - t0)

    return {"p50_step_s": p50, "frames_per_sec": BATCH * T_OUT / p50,
            "p50_step_sync_s": p50_sync,
            "p50_rollout_latency_s": ires["p50"],
            "p50_rollout_latency_sync_s": float(np.median(itimes_sync)),
            "loss": float(m["total"])}


def bench_torch_baseline(iters: int) -> float:
    """Equivalent PyTorch ConvLSTM forecaster train step on CPU (the reference's
    execution model: stock torch.nn ops, eager, single device). Returns p50 step
    seconds. Written fresh for this harness — structured like any textbook
    ConvLSTM, not a copy of the reference."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(0)

    class Cell(nn.Module):
        def __init__(self, cin, ch):
            super().__init__()
            self.ch = ch
            self.conv = nn.Conv2d(cin + ch, 4 * ch, 3, padding=1)

        def forward(self, x, h, c):
            z = self.conv(torch.cat([x, h], 1))
            i, f, o, g = torch.split(z, self.ch, 1)
            c = torch.sigmoid(f) * c + torch.sigmoid(i) * torch.tanh(g)
            h = torch.sigmoid(o) * torch.tanh(c)
            return h, c

    class Forecaster(nn.Module):
        def __init__(self, hidden, t_in, t_out):
            super().__init__()
            dims = [1] + list(hidden)
            self.cells = nn.ModuleList(
                [Cell(dims[i], dims[i + 1]) for i in range(len(hidden))])
            self.head = nn.Conv2d(hidden[-1], 1, 3, padding=1)
            self.t_in, self.t_out = t_in, t_out

        def forward(self, frames):
            b, _, _, hh, ww = frames.shape
            states = [(torch.zeros(b, c.ch, hh, ww), torch.zeros(b, c.ch, hh, ww))
                      for c in self.cells]
            out, outs = None, []
            for t in range(self.t_in + self.t_out - 1):
                x = frames[:, t] if t < self.t_in else out
                for li, cell in enumerate(self.cells):
                    h, c = states[li]
                    h, c = cell(x, h, c)
                    states[li] = (h, c)
                    x = h
                out = self.head(x)
                if t >= self.t_in - 1:
                    outs.append(out)
            return torch.stack(outs, 1)

    rng = np.random.default_rng(0)
    inputs = torch.from_numpy(rng.random((BATCH, T_IN, 1, SIZE, SIZE)).astype(np.float32))
    targets = torch.from_numpy(rng.random((BATCH, T_OUT, 1, SIZE, SIZE)).astype(np.float32))
    model = Forecaster(HIDDEN, T_IN, T_OUT)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)

    def one_step():
        opt.zero_grad()
        pred = model(inputs)
        loss = F.l1_loss(pred[:, :, 0], targets[:, :, 0])
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 0.5)
        opt.step()

    one_step()  # warmup
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        one_step()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def get_torch_baseline(iters: int) -> float:
    key = f"torch_cpu_b{BATCH}_t{T_IN}+{T_OUT}_s{SIZE}_h{'x'.join(map(str, HIDDEN))}"
    cache = {}
    if os.path.exists(CACHE_PATH):
        with open(CACHE_PATH) as f:
            cache = json.load(f)
    if key in cache:
        return cache[key]
    p50 = bench_torch_baseline(iters)
    cache[key] = p50
    with open(CACHE_PATH, "w") as f:
        json.dump(cache, f, indent=1)
    return p50


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args()
    iters = 3 if args.quick else 10
    torch_iters = 2 if args.quick else 3

    jax_res = bench_jax(iters)
    torch_p50 = get_torch_baseline(torch_iters)
    torch_fps = BATCH * T_OUT / torch_p50

    result = {
        "metric": "train_step_throughput_10frame_128px_rollout",
        "value": round(jax_res["frames_per_sec"], 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(jax_res["frames_per_sec"] / torch_fps, 2),
        "p50_step_s": round(jax_res["p50_step_s"], 4),
        "p50_step_sync_s": round(jax_res["p50_step_sync_s"], 4),
        "p50_rollout_latency_s": round(jax_res["p50_rollout_latency_s"], 4),
        "p50_rollout_latency_sync_s": round(
            jax_res["p50_rollout_latency_sync_s"], 4),
        "baseline_p50_step_s": round(torch_p50, 4),
        "baseline": "equivalent PyTorch CPU train step (reference execution model)",
        "timing": "steady-state (chained steps, one sync); *_sync_s = per-call",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
