"""Profiling helpers: wall-clock step timing with proper device synchronization, and
a ``jax.profiler`` trace wrapper (SURVEY.md §5: the reference has no tracing at all —
this is the TPU-build equivalent)."""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import numpy as np


class Timer:
    """Accumulating wall-clock timer; ``block`` keyword syncs the device first."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self, block_on=None):
        start = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.times.append(time.perf_counter() - start)

    @property
    def median(self) -> float:
        return float(np.median(self.times)) if self.times else float("nan")

    @property
    def p50(self) -> float:
        return self.median


def benchmark_fn(fn: Callable, *args, warmup: int = 2, iters: int = 10,
                 **kwargs) -> Dict[str, float]:
    """Benchmark a device function: compile+warmup, then timed runs.

    Returns {p50, mean, min} seconds per call."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        start = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - start)
    return {"p50": float(np.median(times)), "mean": float(np.mean(times)),
            "min": float(np.min(times))}


def benchmark_chained(step_fn: Callable, state, fetch: Callable,
                      chain: int = 10, iters: int = 10,
                      warmup: int = 1) -> Dict[str, float]:
    """Steady-state benchmark of a state-carrying step: CHAIN dependent calls,
    ONE sync (via `fetch(state)`), per-call = total/chain.

    Per-jitted-call dispatch+sync through the axon tunnel costs ~26 ms
    (experiments/ablate_train_step.py) — per-call timing charges that to every
    step and under-reports training throughput by ~35% at bench shapes; a real
    training loop syncs once per log interval, which this models.

    `step_fn(state) -> state` must donate/consume its input state.
    Returns {p50, mean, min} seconds per step plus the final state."""
    for _ in range(warmup):
        state = step_fn(state)
    fetch(state)
    times = []
    for _ in range(iters):
        start = time.perf_counter()
        for _ in range(chain):
            state = step_fn(state)
        fetch(state)
        times.append((time.perf_counter() - start) / chain)
    return {"p50": float(np.median(times)), "mean": float(np.mean(times)),
            "min": float(np.min(times)), "state": state}


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard/Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
