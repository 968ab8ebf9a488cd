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
    with t.measure(block_on=jnp.ones(4)):
        pass
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
