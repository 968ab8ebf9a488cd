"""Experiment: inside-pallas matmul structure for the ConvLSTM conv.

Question: the cell runs at ~14% MXU util; is the 9-tap (K=128) loop the limiter,
and does a single K=1152 contraction (pallas-side im2col) do better?
All data starts in VMEM (no DMA) to isolate the MXU/layout behavior."""
import functools
import numpy as np, jax, jax.numpy as jnp, time
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

dt = jnp.bfloat16
M, K, N, TAPS, REPS = 1024, 128, 256, 9, 64


def taps_kernel(a_ref, w_ref, o_ref):
    def body(r, acc):
        for t in range(TAPS):
            acc = acc + jnp.dot(a_ref[t], w_ref[t],
                                preferred_element_type=jnp.float32)
        return acc
    acc = jax.lax.fori_loop(0, REPS, body, jnp.zeros((M, N), jnp.float32))
    o_ref[...] = acc.astype(o_ref.dtype)


def big_kernel(a_ref, w_ref, o_ref):
    def body(r, acc):
        return acc + jnp.dot(a_ref[...], w_ref[...],
                             preferred_element_type=jnp.float32)
    acc = jax.lax.fori_loop(0, REPS, body, jnp.zeros((M, N), jnp.float32))
    o_ref[...] = acc.astype(o_ref.dtype)


def main():
    # all device work (backend init, uploads, jit warm-up) stays inside main
    # so importing this module never spins up the tunnel helper
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pl_convlstm_gan_tpu.utils.profiling import setup_compile_cache
    setup_compile_cache()

    rng = np.random.default_rng(0)
    a9 = jnp.asarray(rng.random((TAPS, M, K)), dtype=dt)
    w9 = jnp.asarray(rng.random((TAPS, K, N)), dtype=dt)
    abig = jnp.asarray(rng.random((M, TAPS * K)), dtype=dt)
    wbig = jnp.asarray(rng.random((TAPS * K, N)), dtype=dt)

    f_taps = jax.jit(lambda a, w: pl.pallas_call(
        taps_kernel, out_shape=jax.ShapeDtypeStruct((M, N), dt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a, w))
    f_big = jax.jit(lambda a, w: pl.pallas_call(
        big_kernel, out_shape=jax.ShapeDtypeStruct((M, N), dt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a, w))

    for name, f, args, flops in [
            ("9-tap-loop", f_taps, (a9, w9), 2 * M * K * N * TAPS * REPS),
            ("one-K1152", f_big, (abig, wbig), 2 * M * TAPS * K * N * REPS)]:
        o = f(*args); np.asarray(o[0, 0])
        ts = []
        for _ in range(10):
            t0 = time.perf_counter(); o = f(*args); np.asarray(o[0, 0])
            ts.append(time.perf_counter() - t0)
        per = np.median(ts)
        print(name, "ms", round(per * 1e3, 3), "TFLOP/s",
              round(flops / per / 1e12, 1), flush=True)


if __name__ == "__main__":
    main()

# Results (v5e-1, 2026-08-16): both variants ~1 TFLOP/s — NOT representative of
# the production kernel (which hits ~28 TFLOP/s at the same dot shapes). The
# fori_loop-over-reps timing harness serializes MXU passes against the live f32
# accumulator and dominates with per-iteration overhead. Takeaways:
#  - don't benchmark MXU throughput with an accumulate-in-carry rep loop;
#  - K=1152 single contraction shows no advantage over the 9-tap loop;
#  - the cell's ~14% MXU utilization is a property of the small-K (128) conv
#    shape under both XLA and Pallas; the path to more is wider channels, not
#    kernel restructuring at these sizes.
