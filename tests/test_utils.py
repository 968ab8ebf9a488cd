"""Utility tests: profiling helpers and mesh utilities."""
import jax
import jax.numpy as jnp
import numpy as np

from pl_convlstm_gan_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                               maybe_init_distributed,
                                               replicated_sharding)
from pl_convlstm_gan_tpu.utils.profiling import Timer, benchmark_fn


def test_benchmark_fn_returns_stats():
    f = jax.jit(lambda x: x * 2 + 1)
    stats = benchmark_fn(f, jnp.ones((8, 8)), warmup=1, iters=3)
    assert set(stats) == {"p50", "mean", "min"}
    assert stats["min"] <= stats["p50"] >= 0


def test_timer_accumulates():
    t = Timer()
    with t.measure():
        _ = sum(range(1000))
    # the holder lets the block register ITS OWN device output for the sync
    with t.measure() as m:
        m["block_on"] = jnp.ones(4) * 2
    assert len(t.times) == 2
    assert t.p50 == t.median >= 0


def test_mesh_shardings():
    mesh = make_mesh()
    bs = batch_sharding(mesh)
    rs = replicated_sharding(mesh)
    x = jax.device_put(np.zeros((8, 4)), bs)
    y = jax.device_put(np.zeros((8, 4)), rs)
    assert not x.sharding.is_fully_replicated
    assert y.sharding.is_fully_replicated
    # single-process: no-op, must not raise
    maybe_init_distributed()


def test_make_mesh_too_many_devices():
    import pytest
    with pytest.raises(ValueError):
        make_mesh(1000)


def test_benchmark_chained():
    """Chained steady-state timing: runs chain*iters dependent steps and
    returns the final state."""
    import jax.numpy as jnp
    from pl_convlstm_gan_tpu.utils import benchmark_chained
    import jax

    step = jax.jit(lambda s: s + 1.0)
    res = benchmark_chained(step, jnp.zeros(()), fetch=float, chain=3, iters=2,
                            warmup=1)
    assert res["p50"] > 0 and res["min"] <= res["mean"]
    assert float(res["state"]) == 7.0  # 1 warmup + 2*3 chained


def test_sanitize_json_strict():
    """history/metrics artifacts must be strict JSON: NaN/inf -> null."""
    import json
    from pl_convlstm_gan_tpu.utils.metrics_log import sanitize_json
    obj = {"a": float("nan"), "b": [1.0, float("inf")], "c": {"d": 2}, "e": "x"}
    out = sanitize_json(obj)
    s = json.dumps(out, allow_nan=False)   # raises if any non-finite remained
    assert json.loads(s) == {"a": None, "b": [1.0, None], "c": {"d": 2},
                             "e": "x"}


def test_compiled_cost_matmul():
    """XLA cost-model attribution: a K x K matmul must report ~2K^3 flops and
    positive modeled HBM traffic (the tunnel-safe substitute for profiler
    traces — experiments/xla_cost_model.py)."""
    from pl_convlstm_gan_tpu.utils.profiling import compiled_cost

    k = 64
    cost = compiled_cost(lambda a, b: a @ b, jnp.ones((k, k)), jnp.ones((k, k)))
    assert cost["flops"] >= 2 * k**3 * 0.9
    assert cost["bytes_accessed"] > 0
    assert cost["arithmetic_intensity"] > 0


def test_log_compiled_cost_prints(capsys):
    """The debug.log_compiled_cost hook prints one [cost] line and never
    raises, including on an already-jitted fn (the trainers pass their built
    train_step directly)."""
    from pl_convlstm_gan_tpu.utils.profiling import log_compiled_cost

    step = jax.jit(lambda s, x: s + x.sum())
    log_compiled_cost("toy step", step, jnp.zeros(()), jnp.ones((4, 4)))
    out = capsys.readouterr().out
    assert out.startswith("[cost] toy step:")
    assert "MB accessed" in out


def test_compile_cache_cpu_primary_only():
    """Cache policy keys off the PRIMARY platform entry: 'axon,cpu' (TPU
    with CPU fallback) must keep the persistent cache; 'cpu,...' disables."""
    from pl_convlstm_gan_tpu.utils.profiling import _cpu_is_primary

    assert _cpu_is_primary("cpu")
    assert _cpu_is_primary("CPU , tpu")
    assert _cpu_is_primary("cpu,axon")
    assert not _cpu_is_primary("axon,cpu")
    assert not _cpu_is_primary("tpu,cpu")
    assert not _cpu_is_primary("")
