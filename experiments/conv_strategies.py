"""Experiment: 3x3 conv lowering strategies on TPU at ConvLSTM bench shapes.
Run: python experiments/conv_strategies.py  (slow first compile; results printed)"""
import numpy as np, jax, jax.numpy as jnp, time
from jax import lax

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

rng = np.random.default_rng(0)
B, S, C = 4, 128, 128
O = C  # keep in=out so a scan can chain convs
dt = jnp.bfloat16
x = jnp.asarray(rng.random((B, S, S, C)), dtype=dt)
k = jnp.asarray(rng.standard_normal((3, 3, C, O)) * 0.05, dtype=dt)


def conv_lax(c):
    return lax.conv_general_dilated(c, k, (1, 1), [(1, 1), (1, 1)],
                                    dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_mm(c):
    xp = jnp.pad(c, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((B, S, S, O), jnp.float32)
    for di in range(3):
        for dj in range(3):
            win = lax.dynamic_slice(xp, (0, di, dj, 0), (B, S, S, C))
            acc = acc + lax.dot_general(win, k[di, dj], (((3,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    return acc.astype(dt)


def conv_im2col(c):
    xp = jnp.pad(c, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wins = [lax.dynamic_slice(xp, (0, di, dj, 0), (B, S, S, C))
            for di in range(3) for dj in range(3)]
    big = jnp.concatenate(wins, axis=-1)
    return lax.dot_general(big, k.reshape(9 * C, O), (((3,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32).astype(dt)


for name, f in [("lax.conv", conv_lax), ("9-matmul", conv_mm),
                ("im2col-1matmul", conv_im2col)]:
    def body(c, _, f=f):
        return f(c), ()
    g = jax.jit(lambda c, body=body: lax.scan(body, c, None, length=10)[0])
    o = g(x); np.asarray(o[0, 0, 0])
    ts = []
    for _ in range(6):
        t0 = time.perf_counter(); o = g(x); np.asarray(o[0, 0, 0])
        ts.append(time.perf_counter() - t0)
    per = np.median(ts) / 10 * 1e3
    gf = B * S * S * C * O * 9 * 2 / 1e9
    print(name, "per-conv ms", round(per, 3), "TFLOP/s", round(gf / per, 2), flush=True)

# Results (v5e-1, bf16, B4 128x128 C128->O256, single-call timing, 2026-08-16):
#   lax.conv        per-conv 2.901 ms   6.66 TFLOP/s
#   9-matmul        per-conv 2.706 ms   7.14 TFLOP/s   (+7% over lax.conv)
#   im2col-1matmul  per-conv 3.028 ms   6.38 TFLOP/s
# Inside a scan (fused with gate math) the same conv runs ~1.38 ms -> XLA's
# fusion across the cell is doing real work; standalone-op rewrites don't beat
# it meaningfully. Conclusion: keep lax.conv as the XLA path default; the
# Pallas kernel remains the fusion vehicle.
