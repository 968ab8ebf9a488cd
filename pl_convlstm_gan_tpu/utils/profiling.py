"""Profiling helpers: wall-clock step timing with proper device synchronization, and
a ``jax.profiler`` trace wrapper (SURVEY.md §5: the reference has no tracing at all —
this is the TPU-build equivalent)."""
from __future__ import annotations

import contextlib
import os
import time
from typing import Callable, Dict

import jax
import numpy as np


def _cpu_is_primary(selected: str) -> bool:
    """True when the FIRST entry of a JAX platforms list is cpu.

    Only the primary entry decides cache policy: "cpu,tpu" runs on CPU,
    while "tpu,cpu" / "axon,cpu" select the accelerator with CPU as a
    fallback — those runs still want the warm persistent compile cache."""
    return selected.lower().split(",")[0].strip() == "cpu"


def setup_compile_cache(cache_dir: str = "~/.cache/jax_comp") -> None:
    """Enable the persistent XLA compilation cache — first run pays the
    (tunnel-bound, minutes-long) compile, reruns start warm. Call BEFORE
    anything touches the jax backend. No-op on CPU, where AOT cache entries
    are machine-feature sensitive."""
    # CPU may be selected by the env var OR jax.config (the reliable route in
    # this image, per CLAUDE.md); jax.config, when set, overrides the env var.
    configured = str(getattr(jax.config, "jax_platforms", None) or "")
    if _cpu_is_primary(configured or os.environ.get("JAX_PLATFORMS", "")):
        return
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser(cache_dir))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def backend_touch_is_hang_safe() -> bool:
    """True when the first in-process backend touch cannot hang on a dead
    accelerator tunnel, so launchers may skip the subprocess probe:

    - CPU is the primary platform via ``jax.config`` (the reliable route in
      this image — the accelerator plugin never initializes), or
    - CPU is primary via the env var AND the axon pool variable is unset
      (with it set, even env-selected CPU runs dial the relay at backend
      init and block forever when the tunnel is down — CLAUDE.md)."""
    configured = str(getattr(jax.config, "jax_platforms", None) or "")
    if configured and _cpu_is_primary(configured):
        return True
    return (_cpu_is_primary(os.environ.get("JAX_PLATFORMS", ""))
            and not os.environ.get("PALLAS_AXON_POOL_IPS"))


_PROBE_MARKER = "~/.cache/plcg_backend_ok"


def _probe_env_fingerprint() -> str:
    """The env facts that change what a backend probe actually verifies: the
    platform selection and whether the axon pool var routes backend init
    through the tunnel. A marker written under one fingerprint must not be
    trusted under another (e.g. a pool-var-less probe that silently fell back
    to CPU proves nothing about a tunnel-bound launch)."""
    return "platforms=%s|pool=%d" % (
        os.environ.get("JAX_PLATFORMS", ""),
        bool(os.environ.get("PALLAS_AXON_POOL_IPS")))


def probe_backend(timeout_s: float = 150.0,
                  cache_ttl_s: float = 600.0) -> bool:
    """True when jax backend init succeeds in a KILLABLE subprocess — the
    in-process equivalent blocks forever when the TPU tunnel is down.

    A successful probe writes a marker file recording the probe-relevant env
    fingerprint; within ``cache_ttl_s`` seconds subsequent probes under the
    SAME fingerprint trust it and return immediately, so back-to-back
    launches don't each pay a full backend spin-up (~20-100s through the
    tunnel). Failures are never cached. ``cache_ttl_s=0`` (or the
    ``PLCG_PROBE_TTL`` env var) disables the marker entirely.

    The marker is a deliberate trade: a tunnel that dies within the TTL of a
    successful probe will still hang the next launch's backend init. Callers
    that cannot tolerate that window should pass ``cache_ttl_s=0``."""
    import subprocess
    import sys
    ttl_env = os.environ.get("PLCG_PROBE_TTL")
    if ttl_env is not None:
        cache_ttl_s = float(ttl_env)
    marker = os.path.expanduser(_PROBE_MARKER)
    fingerprint = _probe_env_fingerprint()
    if cache_ttl_s:
        try:
            if time.time() - os.path.getmtime(marker) < cache_ttl_s:
                with open(marker) as f:
                    if f.read().strip() == fingerprint:
                        return True
        except OSError:
            pass
    try:
        ok = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL).returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    if ok and cache_ttl_s:
        try:
            os.makedirs(os.path.dirname(marker), exist_ok=True)
            with open(marker, "w") as f:
                f.write(fingerprint)
        except OSError:
            pass
    return ok


class Timer:
    """Accumulating wall-clock timer.

    ``measure()`` yields a dict holder: set ``holder["block_on"]`` to a value
    PRODUCED INSIDE the block to sync the device before the window closes —
    a keyword argument could only reference pre-existing values (evaluated at
    ``__enter__``), which times draining PREVIOUS device work instead of the
    body's own::

        with timer.measure() as m:
            out = step(x)
            m["block_on"] = out
    """

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self):
        holder: dict = {}
        start = time.perf_counter()
        yield holder
        if "block_on" in holder:
            jax.block_until_ready(holder["block_on"])
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


def compiled_cost(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """Static cost attribution of a jitted function from XLA's own cost model.

    Lowers + compiles ``fn`` for the given abstract args and reads the
    compiled executable's cost/memory analysis — no execution, no trace
    (``jax.profiler`` does not work through the axon tunnel; this does, because
    the analysis is client-side on the compiled program).

    Returns flops, bytes_accessed (HBM traffic as modeled by XLA),
    arithmetic intensity (flops/byte), and peak temp/argument/output sizes.
    Combine with a measured step time for achieved TFLOP/s and HBM GB/s:
    ``flops / t / 1e12``, ``bytes_accessed / t / 1e9``.
    """
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)  # accept jitted fns
    compiled = jitted.lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    out = {"flops": flops, "bytes_accessed": byts,
           "arithmetic_intensity": flops / byts if byts else float("nan")}
    mem = compiled.memory_analysis()
    if mem is not None:
        out.update(
            argument_size_bytes=float(mem.argument_size_in_bytes),
            output_size_bytes=float(mem.output_size_in_bytes),
            temp_size_bytes=float(mem.temp_size_in_bytes),
        )
    return out


def log_compiled_cost(label: str, fn: Callable, *args, **kwargs) -> None:
    """One-line cost summary of a (jitted) step fn — the trainers call this on
    the first step when ``debug.log_compiled_cost`` is set. Never raises: the
    cost model's availability varies by backend.

    Cost note: the AOT ``lower().compile()`` here does not populate the jit
    dispatch cache, so the first real step still compiles separately — with
    the persistent compilation cache enabled (main.py) the second compile is
    a disk hit, but a cold cache pays the full compile twice. Acceptable for
    an opt-in debug flag; don't enable it in tight CI loops."""
    try:
        c = compiled_cost(fn, *args, **kwargs)
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"[cost] {label}: cost model unavailable ({e})")
        return
    temp = c.get("temp_size_bytes", 0.0)
    print(f"[cost] {label}: {c['flops']/1e9:.2f} GFLOP "
          f"(scan bodies counted once), "
          f"{c['bytes_accessed']/1e6:.0f} MB accessed, "
          f"live temp {temp/1e6:.0f} MB")
