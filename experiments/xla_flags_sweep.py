"""TPU compiler-option sweep on the bench train step — the last perf layer.

Kernel-level rewrites, scan restructuring, and remat policies are all measured
closed (docs/design.md); the remaining untouched layer is XLA's own scheduling
knobs. Client-side ``XLA_FLAGS`` can NOT reach the TPU compiler through the
axon tunnel (the local parser rejects TPU flags: "Unknown flag in XLA_FLAGS"),
but per-compile ``compiler_options`` ride the compile request, so each variant
is one AOT ``lower().compile(compiler_options=...)`` timed steady-state.

Run: python experiments/xla_flags_sweep.py [--iters 8] [--chain 8]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from pl_convlstm_gan_tpu.utils.profiling import setup_compile_cache

setup_compile_cache()

import jax.numpy as jnp  # noqa: E402

from pl_convlstm_gan_tpu.models import ConvLSTMForecaster  # noqa: E402
from pl_convlstm_gan_tpu.train import (TrainState, make_forecaster_train_step,  # noqa: E402
                                       make_optimizer)
from pl_convlstm_gan_tpu.utils.profiling import benchmark_chained  # noqa: E402

BATCH, T_IN, T_OUT, SIZE, HIDDEN = 4, 5, 10, 128, (64, 64)

VARIANTS = {
    "baseline": {},
    "no_latency_hiding": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    "scoped_vmem_96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "scoped_vmem_32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--chain", type=int, default=8)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", file=sys.stderr)

    rng = np.random.default_rng(0)
    inputs = jnp.asarray(rng.random((BATCH, T_IN, 1, SIZE, SIZE), np.float32))
    targets = jnp.asarray(rng.random((BATCH, T_OUT, 1, SIZE, SIZE), np.float32))
    model = ConvLSTMForecaster(hidden_dims=HIDDEN, input_frames=T_IN,
                               output_frames=T_OUT, dtype=jnp.bfloat16)
    tx = make_optimizer(0.5)
    step = make_forecaster_train_step(model.apply, tx)
    lr, tf, key = jnp.asarray(1e-3), jnp.asarray(0.0), jax.random.PRNGKey(1)

    out = {}
    for name, opts in VARIANTS.items():
        # fresh params per variant: the step DONATES its state, so a shared
        # params tree would be deleted by the first variant's run
        params = model.init(jax.random.PRNGKey(0), inputs)
        state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        try:
            compiled = step.lower(state, (inputs, targets), lr, tf,
                                  key).compile(compiler_options=opts or None)

            def chain_step(st, _c=compiled):
                st, _ = _c(st, (inputs, targets), lr, tf, key)
                return st

            p50 = benchmark_chained(chain_step, state,
                                    fetch=lambda s: float(s.step),
                                    chain=args.chain, iters=args.iters,
                                    warmup=2)["p50"]
            out[name] = {"p50_ms": round(p50 * 1e3, 2)}
        except Exception as e:  # option rejected server-side, OOM, ...
            out[name] = {"error": str(e)[:300]}
        print(json.dumps({name: out[name]}), file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
