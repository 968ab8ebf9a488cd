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

# v5e per-chip peaks (public spec) for the roofline fields
PEAK_BF16_TFLOPS = 197.0
HBM_GBPS = 819.0


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

    # roofline attribution off XLA's own cost model (profiler traces don't
    # work through the axon tunnel; this is client-side on the compiled
    # program). The model counts the lax.scan body ONCE and the step is
    # ~all-scan, so trip-adjust by x(T_in+T_out-1) — validated against
    # hand-computed FLOPs in experiments/xla_cost_model.py. Lower BEFORE any
    # execution: the step donates its state.
    roofline = {}
    skips = {}
    try:
        from pl_convlstm_gan_tpu.utils.profiling import compiled_cost
        # pass the jitted step itself: identical program -> the AOT lower
        # shares the persistent-cache entry with the benchmarked step (a
        # wrapper lambda would force a second full tunnel compile cold)
        cost = compiled_cost(step, state, (inputs, targets), lr, tf, key)
        trips = T_IN + T_OUT - 1
        roofline = {"flops": cost["flops"] * trips,
                    "bytes": cost["bytes_accessed"] * trips}
    except Exception as e:  # cost model availability varies by backend
        # one failure drops all four modeled rows — name them all
        skips["mfu+modeled_tflops_per_s+modeled_hbm_gbps"
              "+modeled_hbm_frac_of_roofline"] = f"cost model unavailable: {e}"

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

    # multi-step VMEM-resident Pallas rollout kernel (round 3): the serving
    # path predict selects on TPU (model.rollout_impl auto)
    pallas_rollout_p50 = None
    try:
        from pl_convlstm_gan_tpu.ops.pallas.rollout_kernel import (
            rollout_pallas, rollout_pallas_fits)
        if jax.default_backend() != "tpu":
            skips["p50_rollout_latency_pallas_s"] = \
                f"backend is {jax.default_backend()}, kernel rows are TPU-only"
        elif not rollout_pallas_fits(T_IN, T_OUT, BATCH, 1, SIZE, SIZE,
                                     HIDDEN, 3, 2):
            skips["p50_rollout_latency_pallas_s"] = \
                "rollout_pallas_fits rejected the bench shape"
        else:
            pk = jax.jit(lambda p, x: rollout_pallas(p, x, T_OUT, jnp.bfloat16))
            pres = benchmark_chained(lambda _: pk(state.params, inputs), None,
                                     fetch=lambda o: float(o[0, 0, 0, 0, 0]),
                                     chain=chain, iters=iters, warmup=1)
            pallas_rollout_p50 = pres["p50"]
    except Exception as e:  # the headline must survive a kernel regression
        skips["p50_rollout_latency_pallas_s"] = repr(e)

    # int8 PTQ rollout (round 4, models/quantized.py): s8xs8->s32 MXU convs.
    # TPU-gated like the kernel row — the CPU int8 conv path is unoptimized
    # and would burn minutes for a meaningless number
    int8_rollout_p50 = None
    try:
        if jax.default_backend() != "tpu":
            skips["p50_rollout_latency_int8_s"] = \
                f"backend is {jax.default_backend()}, int8 convs are " \
                "unoptimized on CPU (~70x slower, meaningless number)"
        else:
            from pl_convlstm_gan_tpu.models.quantized import (
                prepare_int8_forecaster, rollout_int8)
            qparams = prepare_int8_forecaster(state.params)
            ik = jax.jit(lambda q, x: rollout_int8(q, x, T_OUT))
            qres = benchmark_chained(lambda _: ik(qparams, inputs), None,
                                     fetch=lambda o: float(o[0, 0, 0, 0, 0]),
                                     chain=chain, iters=iters, warmup=1)
            int8_rollout_p50 = qres["p50"]
    except Exception as e:  # ditto
        skips["p50_rollout_latency_int8_s"] = repr(e)

    res = {"p50_step_s": p50, "frames_per_sec": BATCH * T_OUT / p50,
           "p50_step_sync_s": p50_sync,
           "p50_rollout_latency_s": ires["p50"],
           "p50_rollout_latency_sync_s": float(np.median(itimes_sync)),
           "loss": float(m["total"]),
           "skips": skips}
    if pallas_rollout_p50 is not None:
        res["p50_rollout_latency_pallas_s"] = pallas_rollout_p50
    if int8_rollout_p50 is not None:
        res["p50_rollout_latency_int8_s"] = int8_rollout_p50
    if roofline:
        res["modeled_tflops_per_s"] = roofline["flops"] / p50 / 1e12
        res["mfu"] = roofline["flops"] / p50 / (PEAK_BF16_TFLOPS * 1e12)
        res["modeled_hbm_gbps"] = roofline["bytes"] / p50 / 1e9
        res["modeled_hbm_frac_of_roofline"] = \
            roofline["bytes"] / p50 / 1e9 / HBM_GBPS
    return res


def bench_secondary(iters: int) -> dict:
    """Secondary driver-visible numbers (docs/design.md benchmark table):
    the reference-parity Generator train step (B8 T5 16->x8=128, full
    4-term CombinedLoss) and the config-#5 256px GAN per-chip train step
    (5-in/30-out, B1, alternating D/G updates). Steady-state chained timing."""
    import jax
    import jax.numpy as jnp
    from pl_convlstm_gan_tpu.data import SyntheticDownscalingDataset, batch_iterator
    from pl_convlstm_gan_tpu.models import (ConvLSTMForecaster, Discriminator,
                                            Generator)
    from pl_convlstm_gan_tpu.train import (GANTrainState, TrainState,
                                           make_gan_train_step,
                                           make_generator_train_step,
                                           make_optimizer)
    from pl_convlstm_gan_tpu.utils.profiling import benchmark_chained

    out = {}
    skips = {}
    # --- parity Generator (reference workload shapes)
    ds = SyntheticDownscalingDataset(num_days=64, T=5, lr_size=16,
                                     scale_factor=8, num_stations=16, seed=0)
    gmodel = Generator(hidden_dims=(16, 32), lu_channels=ds.num_lu_classes,
                       scale_factor=8, dtype=jnp.bfloat16)
    batch = tuple(jnp.asarray(x) for x in next(batch_iterator(ds, 8)))
    params = gmodel.init(jax.random.PRNGKey(0), *batch[:3])
    tx = make_optimizer(0.5)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    gstep = make_generator_train_step(
        gmodel.apply, tx,
        dict(lambda_point=1.0, lambda_conserve=1.0, lambda_smooth=0.1,
             lambda_temporal=0.05, use_weighted_loss=True,
             weight_strategy="log"))
    glr = jnp.asarray(5e-4)
    state, m = gstep(state, batch, glr)
    _ = float(m["total"])
    res = benchmark_chained(lambda st: gstep(st, batch, glr)[0], state,
                            fetch=lambda s: float(s.step), chain=10,
                            iters=iters)
    out["parity_generator_step_s"] = res["p50"]
    out["parity_generator_frames_per_sec"] = 8 * 5 / res["p50"]

    # --- 256px GAN per-chip step (configs/gan_256_single.yaml shapes, B1 =
    # the dp_v5e16 per-chip share). Benched at the SHIPPING config knobs:
    # gan_step_impl vjp + remat save_z, the measured-best combo at this
    # HBM-bound shape (181.7 vs 241 ms default = -24.7%, v5e 2026-08-19,
    # experiments/gan256_roofline.py — exact-math equivalent, pinned in
    # tests/test_sequence_trainer.py)
    rng = np.random.default_rng(0)
    inp = jnp.asarray(rng.random((1, 5, 1, 256, 256)).astype(np.float32))
    tgt = jnp.asarray(rng.random((1, 30, 1, 256, 256)).astype(np.float32))
    gen = ConvLSTMForecaster(hidden_dims=(64, 64), input_frames=5,
                             output_frames=30, dtype=jnp.bfloat16,
                             remat=True, remat_policy="save_z")
    disc = Discriminator(features=(64, 128, 256), dtype=jnp.bfloat16)
    gp = gen.init(jax.random.PRNGKey(0), inp)
    dpms = disc.init(jax.random.PRNGKey(1), tgt)
    gtx, dtx = make_optimizer(0.5), make_optimizer(0.5)
    gan_state = GANTrainState(gp, dpms, gtx.init(gp), dtx.init(dpms),
                              jnp.zeros((), jnp.int32))
    gan_step = make_gan_train_step(gen.apply, disc.apply, gtx, dtx,
                                   lambda_adv=0.001, lambda_l1=1.0,
                                   impl="vjp")
    glr2 = jnp.asarray(2e-4)
    tf = jnp.asarray(0.5)
    key = jax.random.PRNGKey(2)
    gan_state, m = gan_step(gan_state, (inp, tgt), glr2, glr2, tf, key)
    _ = float(m["g_total"])
    res = benchmark_chained(
        lambda st: gan_step(st, (inp, tgt), glr2, glr2, tf, key)[0],
        gan_state, fetch=lambda s: float(s.step), chain=4,
        iters=max(3, iters // 2))
    out["gan256_step_s"] = res["p50"]
    out["gan256_frames_per_sec"] = 30 / res["p50"]

    # --- streaming serving branch (round 3): horizon-30 forecast from a warm
    # stream state at B1, XLA scan vs the warm-start VMEM-resident kernel
    try:
        from pl_convlstm_gan_tpu.config import Config
        from pl_convlstm_gan_tpu.ops.pallas.rollout_kernel import (
            rollout_pallas_fits, rollout_pallas_from_state)
        from pl_convlstm_gan_tpu.streaming import StreamingForecaster

        scfg = Config.from_dict({
            "data": {"source": "synthetic"},
            "model": {"family": "forecaster", "hidden_dims": [64, 64],
                      "input_frames": 5, "output_frames": 10},
            "training": {"batch_size": 8, "epochs": 1},
            "precision": {"compute_dtype": "bfloat16"},
            "output": {"output_dir": "/tmp/unused_bench_stream"},
        })
        sfr = jnp.asarray(rng.random((1, 5, 1, 128, 128)).astype(np.float32))
        smodel = ConvLSTMForecaster(hidden_dims=(64, 64), input_frames=5,
                                    output_frames=10, dtype=jnp.bfloat16)
        svars = smodel.init(jax.random.PRNGKey(3), sfr)
        sf = StreamingForecaster(scfg, svars)
        warm, _ = sf.observe_window(sf.init_state(1, 128, 128), sfr)
        res = benchmark_chained(
            lambda _: sf._jit_forecast(sf._vars, warm, horizon=30), None,
            fetch=lambda o: float(o[0, 0, 0, 0, 0]), chain=10, iters=iters)
        out["stream_forecast30_p50_s"] = res["p50"]
        # multi-stream scaling point (round-3 VERDICT item 5): the same
        # horizon-30 branch serving 8 concurrent streams — how the batch-
        # polymorphic serving surface amortizes (full sweep: experiments/
        # streaming_latency.py --batch-sweep)
        sfr8 = jnp.asarray(rng.random((8, 5, 1, 128, 128)).astype(np.float32))
        warm8, _ = sf.observe_window(sf.init_state(8, 128, 128), sfr8)
        res8 = benchmark_chained(
            lambda _: sf._jit_forecast(sf._vars, warm8, horizon=30), None,
            fetch=lambda o: float(o[0, 0, 0, 0, 0]), chain=10, iters=iters)
        out["stream_forecast30_b8_p50_s"] = res8["p50"]
        if jax.default_backend() != "tpu":
            skips["stream_forecast30_pallas_p50_s"] = \
                f"backend is {jax.default_backend()}, kernel rows are TPU-only"
        elif not rollout_pallas_fits(1, 30, 1, 1, 128, 128, (64, 64), 3, 2,
                                     warm=True):
            skips["stream_forecast30_pallas_p50_s"] = \
                "rollout_pallas_fits rejected the warm h=30 128px shape"
        if "stream_forecast30_pallas_p50_s" not in skips:
            core = sf._vars["params"]
            pk = jax.jit(lambda c, p: rollout_pallas_from_state(
                core, c, p, 30, jnp.bfloat16))
            res = benchmark_chained(
                lambda _: pk(warm.cells, warm.prev_out), None,
                fetch=lambda o: float(o[0, 0, 0, 0, 0]), chain=10,
                iters=iters)
            out["stream_forecast30_pallas_p50_s"] = res["p50"]
            res8 = benchmark_chained(
                lambda _: pk(warm8.cells, warm8.prev_out), None,
                fetch=lambda o: float(o[0, 0, 0, 0, 0]), chain=10,
                iters=iters)
            out["stream_forecast30_pallas_b8_p50_s"] = res8["p50"]

        # 256px serving family (config #5 shapes; round-4): XLA scan, plus
        # the streamed-I/O kernel once a 256px Mosaic compile finishes on
        # hardware (auto=True keeps this honest — the field appears only
        # after the _MOSAIC_VALIDATED_MAX_DIM envelope admits 256px; the
        # streamed gate itself flipped True round 5 on the 128px win)
        sfr256 = jnp.asarray(
            rng.random((1, 5, 1, 256, 256)).astype(np.float32))
        sf256 = StreamingForecaster(scfg, svars)   # params are size-free
        warm256, _ = sf256.observe_window(sf256.init_state(1, 256, 256),
                                          sfr256)
        res = benchmark_chained(
            lambda _: sf256._jit_forecast(sf256._vars, warm256, horizon=30),
            None, fetch=lambda o: float(o[0, 0, 0, 0, 0]), chain=4,
            iters=max(3, iters // 2))
        out["stream256_forecast30_p50_s"] = res["p50"]
        if jax.default_backend() == "tpu" and rollout_pallas_fits(
                1, 30, 1, 1, 256, 256, (64, 64), 3, 2, warm=True,
                auto=True):
            pk256 = jax.jit(lambda c, p: rollout_pallas_from_state(
                sf256._vars["params"], c, p, 30, jnp.bfloat16))
            res = benchmark_chained(
                lambda _: pk256(warm256.cells, warm256.prev_out), None,
                fetch=lambda o: float(o[0, 0, 0, 0, 0]), chain=4,
                iters=max(3, iters // 2))
            out["stream256_forecast30_pallas_p50_s"] = res["p50"]
        else:
            skips["stream256_forecast30_pallas_p50_s"] = (
                "kernel rows are TPU-only"
                if jax.default_backend() != "tpu" else
                "auto dispatch rejected: 256px exceeds the hardware-"
                "validated <=128px Mosaic compile envelope "
                "(_MOSAIC_VALIDATED_MAX_DIM; four timed-out 256px compiles)")

    except Exception as e:  # the headline must survive a streaming regression
        skips["streaming_rows"] = repr(e)

    # flagship nowcast_128 family (3 equal-width cells, 5-in/20-out): the
    # hardware-validated rollout kernel `auto` now serves vs the XLA scan —
    # the round-5 headline serving win (-36.7% measured on v5e). Independent
    # of the streaming branch, so its own try: a streaming regression must
    # not silently drop these rows (the round-4 missing-row harness bug).
    try:
        from pl_convlstm_gan_tpu.ops.pallas.rollout_kernel import (
            rollout_pallas, rollout_pallas_fits)
        fl_in = jnp.asarray(
            rng.random((4, 5, 1, 128, 128)).astype(np.float32))
        fl = ConvLSTMForecaster(hidden_dims=(64, 64, 64), input_frames=5,
                                output_frames=20, dtype=jnp.bfloat16)
        flp = fl.init(jax.random.PRNGKey(7), fl_in)
        flx = jax.jit(lambda p, x: fl.apply(p, x))
        res = benchmark_chained(lambda _: flx(flp, fl_in), None,
                                fetch=lambda o: float(o[0, 0, 0, 0, 0]),
                                chain=4, iters=max(3, iters // 2), warmup=1)
        out["flagship3_rollout_xla_p50_s"] = res["p50"]
        if jax.default_backend() == "tpu" and rollout_pallas_fits(
                5, 20, 4, 1, 128, 128, (64, 64, 64), 3, 2, auto=True):
            flk = jax.jit(lambda p, x: rollout_pallas(p, x, 20, jnp.bfloat16))
            res = benchmark_chained(lambda _: flk(flp, fl_in), None,
                                    fetch=lambda o: float(o[0, 0, 0, 0, 0]),
                                    chain=4, iters=max(3, iters // 2),
                                    warmup=1)
            out["flagship3_rollout_pallas_p50_s"] = res["p50"]
        else:
            skips["flagship3_rollout_pallas_p50_s"] = (
                "kernel rows are TPU-only"
                if jax.default_backend() != "tpu" else
                "auto dispatch rejected the flagship 3-cell family "
                "(_MOSAIC_VALIDATED_CELLS regressed?)")
    except Exception as e:
        skips["flagship3_rows"] = repr(e)
    out["_skips"] = skips
    return out


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

    # Fail FAST (and loudly) if the backend is unreachable, riding out brief
    # tunnel blips first — bound the unreachable case rather than hang (a
    # tunnel death within the probe marker's TTL of a prior success can still
    # hang backend init; see probe_backend). Each probe attempt restarts
    # backend spin-up from scratch, so the per-attempt timeout must cover a
    # full cold init (~20-100s through the tunnel; 150s per the CLAUDE.md
    # probe recipe) even under --quick — capping it below that would
    # false-negative a healthy cold backend.
    from pl_convlstm_gan_tpu.utils.profiling import probe_backend
    probe_window_s = 150.0 if args.quick else 15 * 60.0
    start = time.time()
    deadline = start + probe_window_s
    while not probe_backend(timeout_s=150.0):
        if time.time() >= deadline:
            print(json.dumps({
                "metric": "train_step_throughput_10frame_128px_rollout",
                "value": None, "unit": "frames/sec/chip", "vs_baseline": None,
                "error": f"jax backend unreachable for "
                         f"{(time.time() - start) / 60:.1f} min "
                         f"(TPU tunnel down?)",
            }))
            sys.exit(1)
        time.sleep(30)

    jax_res = bench_jax(iters)
    secondary = {} if args.quick else bench_secondary(iters)
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
    for k in ("modeled_tflops_per_s", "mfu", "modeled_hbm_gbps",
              "modeled_hbm_frac_of_roofline"):
        if k in jax_res:
            result[k] = round(jax_res[k], 3)
    for k in ("p50_rollout_latency_pallas_s", "p50_rollout_latency_int8_s"):
        if k in jax_res:
            result[k] = round(jax_res[k], 4)
    skips = dict(jax_res.get("skips", {}))
    skips.update(secondary.pop("_skips", {}))
    for k, v in secondary.items():
        result[k] = round(v, 4)
    # every intentionally-skipped row is visible in the JSON, not stderr —
    # a missing row with no skip reason is a harness bug (round-4 VERDICT 4)
    for k, v in skips.items():
        result[f"skipped_{k}"] = v
    print(json.dumps(result))


if __name__ == "__main__":
    main()
