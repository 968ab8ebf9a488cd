"""Peak-probe: raw matmul throughput at the ConvLSTM cell's shapes (v5e)."""
import numpy as np, jax, jax.numpy as jnp, time
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
np.asarray(jax.jit(lambda x: x + 7)(jnp.ones((5, 5))))
rng = np.random.default_rng(0)
dt = jnp.bfloat16
for (m, k, n, label) in [(65536, 128, 256, 'cell-shape'),
                         (65536, 1152, 256, 'im2col-shape'),
                         (4096, 4096, 4096, 'square-peak')]:
    a = jnp.asarray(rng.random((m, k)), dtype=dt)
    b = jnp.asarray(rng.random((k, n)), dtype=dt)

    def body(c, _):
        return c + jnp.dot(a, b, preferred_element_type=jnp.float32).sum(), ()

    f = jax.jit(lambda: jax.lax.scan(body, jnp.zeros(()), None, length=10)[0])
    o = f(); float(o)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter(); o = f(); float(o)
        ts.append(time.perf_counter() - t0)
    per = np.median(ts) / 10
    print(label, 'per-matmul ms', round(per * 1e3, 3), 'TFLOP/s',
          round(2 * m * k * n / per / 1e12, 1), flush=True)
