"""Cost-model attribution + lever tests for the 256px GAN train step.

Round-4 VERDICT item 6: the gan_256_single per-chip step (B1, 5-in/30-out,
(64,64) G, (64,128,256) D) measured 242 ms in BENCH_r04 but never got the
roofline/ablation treatment the 128px family did — its headroom is unknown.

This script answers it on hardware:
1. XLA cost-model attribution (utils.profiling.compiled_cost — client-side
   on the compiled program, works through the tunnel) of the G forward, a
   G-only L1 train step, and the full GAN step, each with measured
   steady-state times -> achieved TFLOP/s and HBM GB/s vs the v5e roofline
   (197 bf16 TFLOP/s, 819 GB/s). Scan bodies are costed ONCE by the model,
   so G-scan programs are trip-adjusted x(T_in+T_out-1)=34; the D convs run
   outside any scan (costed exactly).
2. Levers:
   a. G remat inside the GAN step (none / save_z / full) — the 128px Pareto
      said remat is never a speed win; check it holds at 4x the pixels.
   b. One-forward vjp restructure: gan_step_body runs the G forward TWICE
      (once for the D update's `fake`, again inside g_loss_fn). Computing
      the forward once under jax.vjp and pulling the G grad back through it
      AFTER the D update is mathematically identical (same params, same
      rng), saves a full 34-step G forward per step — IF XLA isn't already
      CSE-ing the duplicate. The attribution (modeled flops of the two
      step programs) shows whether it is.

Run on TPU, quiet box: python experiments/gan256_roofline.py [--iters N]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pl_convlstm_gan_tpu.utils.profiling import setup_compile_cache

setup_compile_cache()

import jax
import jax.numpy as jnp

from pl_convlstm_gan_tpu.models import ConvLSTMForecaster, Discriminator
from pl_convlstm_gan_tpu.train import (GANTrainState, TrainState,
                                       make_forecaster_train_step,
                                       make_gan_train_step, make_optimizer)
from pl_convlstm_gan_tpu.utils.profiling import (benchmark_chained,
                                                 compiled_cost)

# configs/gan_256_single.yaml per-chip shapes (dp_v5e16 per-chip share)
B, T_IN, T_OUT, SIZE = 1, 5, 30, 256
HIDDEN, D_FEATURES = (64, 64), (64, 128, 256)
LAMBDA_ADV, LAMBDA_L1 = 0.001, 1.0
PEAK_TFLOPS, HBM_GBPS = 197.0, 819.0


def make_vjp_gan_step(gen_apply, disc_apply, gen_tx, disc_tx,
                      lambda_adv, lambda_l1):
    """One-forward restructure — now the PRODUCTION `gan_step_impl: vjp`
    path (train.steps.gan_step_body(impl="vjp"), promoted from this
    experiment's original inline copy so the A/B measures the code that
    ships): jax.vjp runs the G forward ONCE; the D update consumes
    stop_grad(fake); the G grad pulls the (adv + L1) cotangent back through
    the saved vjp AFTER the D update. Identical math, same NaN-guard."""
    return make_gan_train_step(gen_apply, disc_apply, gen_tx, disc_tx,
                               lambda_adv=lambda_adv, lambda_l1=lambda_l1,
                               impl="vjp")


def cost_row(name, cost, t, trips=1):
    fl, by = cost["flops"] * trips, cost["bytes_accessed"] * trips
    return {"what": name, "p50_s": round(t, 4),
            "modeled_tflops_per_s": round(fl / t / 1e12, 1),
            "mfu": round(fl / t / (PEAK_TFLOPS * 1e12), 3),
            "modeled_hbm_gbps": round(by / t / 1e9, 1),
            "hbm_frac_of_roofline": round(by / t / 1e9 / HBM_GBPS, 2),
            "modeled_tflop": round(fl / 1e12, 2)}


def main():
    global B, T_IN, T_OUT, SIZE, HIDDEN, D_FEATURES
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes on CPU: validates the code paths and "
                         "the vjp-step EQUIVALENCE, numbers meaningless")
    args = ap.parse_args()
    iters = args.iters
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        B, T_IN, T_OUT, SIZE = 2, 2, 3, 16
        HIDDEN, D_FEATURES = (8, 8), (8, 16)
        iters = 2
    trips = T_IN + T_OUT - 1

    rng = np.random.default_rng(0)
    inp = jnp.asarray(rng.random((B, T_IN, 1, SIZE, SIZE)).astype(np.float32))
    tgt = jnp.asarray(rng.random((B, T_OUT, 1, SIZE, SIZE)).astype(np.float32))
    glr = jnp.asarray(2e-4)
    tf = jnp.asarray(0.5)
    key = jax.random.PRNGKey(2)

    # smoke runs in f32 so the vjp-equivalence check is tight
    cdtype = None if args.smoke else jnp.bfloat16

    def build(remat=False, remat_policy=""):
        gen = ConvLSTMForecaster(hidden_dims=HIDDEN, input_frames=T_IN,
                                 output_frames=T_OUT, dtype=cdtype,
                                 remat=remat, remat_policy=remat_policy)
        disc = Discriminator(features=D_FEATURES, dtype=cdtype)
        gp = gen.init(jax.random.PRNGKey(0), inp)
        dpm = disc.init(jax.random.PRNGKey(1), tgt)
        gtx, dtx = make_optimizer(0.5), make_optimizer(0.5)
        st = GANTrainState(gp, dpm, gtx.init(gp), dtx.init(dpm),
                           jnp.zeros((), jnp.int32))
        return gen, disc, gtx, dtx, st

    results = []

    # --- attribution of the production step + G-only pieces
    gen, disc, gtx, dtx, st = build()
    gan_step = make_gan_train_step(gen.apply, disc.apply, gtx, dtx,
                                   lambda_adv=LAMBDA_ADV, lambda_l1=LAMBDA_L1)
    # pass the jitted step itself — a wrapper lambda would be a DIFFERENT
    # program and pay a second cold tunnel compile of the full 256px step
    # (the r4 steps-5/6 timeout failure mode)
    gan_cost = compiled_cost(gan_step, st, (inp, tgt), glr, glr, tf, key)

    gfwd = jax.jit(lambda p, x: gen.apply(p, x))
    # the GAN/L1 steps DONATE their state (CLAUDE.md gotcha) — give each
    # consumer its own copy of the generator params
    gp_fwd = jax.tree_util.tree_map(jnp.array, st.gen_params)
    gp_l1 = jax.tree_util.tree_map(jnp.array, st.gen_params)
    gfwd_cost = compiled_cost(gfwd, gp_fwd, inp)

    ltx = make_optimizer(0.5)
    lstate = TrainState(gp_l1, ltx.init(gp_l1), jnp.zeros((), jnp.int32))
    l1_step = make_forecaster_train_step(gen.apply, ltx)
    l1_cost = compiled_cost(l1_step, lstate, (inp, tgt), glr, tf, key)

    # warm + time (chained steady-state, one fetch — tunnel per-call tax)
    st2, m = gan_step(st, (inp, tgt), glr, glr, tf, key)
    _ = float(m["g_total"])
    r = benchmark_chained(
        lambda s: gan_step(s, (inp, tgt), glr, glr, tf, key)[0], st2,
        fetch=lambda s: float(s.step), chain=4, iters=iters)
    t_gan = r["p50"]

    rf = benchmark_chained(lambda _: gfwd(gp_fwd, inp), None,
                           fetch=lambda o: float(o[0, 0, 0, 0, 0]),
                           chain=8, iters=iters, warmup=1)
    lstate2, lm = l1_step(lstate, (inp, tgt), glr, tf, key)
    _ = float(lm["total"])
    rl = benchmark_chained(
        lambda s: l1_step(s, (inp, tgt), glr, tf, key)[0], lstate2,
        fetch=lambda s: float(s.step), chain=4, iters=iters)

    # scan-trip adjust: G fwd and the L1 step are ~all-scan; the GAN step is
    # two G fwd + one G bwd (scan) + D fwd x3 + D bwd (not scan). Report the
    # GAN step both raw and with its G-scan share trip-adjusted.
    results.append(cost_row("G fwd (scan x34)", gfwd_cost, rf["p50"], trips))
    results.append(cost_row("G L1 train step (scan x34)", l1_cost,
                            rl["p50"], trips))
    d_flops = gan_cost["flops"] - l1_cost["flops"] - gfwd_cost["flops"]
    gan_adj = {
        "flops": l1_cost["flops"] * trips + gfwd_cost["flops"] * trips
        + max(d_flops, 0.0),
        "bytes_accessed": l1_cost["bytes_accessed"] * trips
        + gfwd_cost["bytes_accessed"] * trips
        + max(gan_cost["bytes_accessed"] - l1_cost["bytes_accessed"]
              - gfwd_cost["bytes_accessed"], 0.0)}
    results.append(cost_row("GAN step (G parts x34 + D exact)", gan_adj,
                            t_gan))
    results.append({"what": "D share (modeled, exact)",
                    "modeled_tflop": round(max(d_flops, 0.0) / 1e12, 2)})

    # --- lever a: remat variants inside the GAN step
    for label, kw in (("remat save_z", dict(remat=True, remat_policy="save_z")),
                      ("remat full", dict(remat=True))):
        geni, disci, gtxi, dtxi, sti = build(**kw)
        stepi = make_gan_train_step(geni.apply, disci.apply, gtxi, dtxi,
                                    lambda_adv=LAMBDA_ADV,
                                    lambda_l1=LAMBDA_L1)
        sti, mi = stepi(sti, (inp, tgt), glr, glr, tf, key)
        _ = float(mi["g_total"])
        ri = benchmark_chained(
            lambda s: stepi(s, (inp, tgt), glr, glr, tf, key)[0], sti,
            fetch=lambda s: float(s.step), chain=4, iters=iters)
        results.append({"what": f"GAN step, {label}",
                        "p50_s": round(ri["p50"], 4),
                        "delta_vs_default": round(
                            (ri["p50"] - t_gan) / t_gan * 100, 1)})

    # --- lever b: one-forward vjp restructure
    if args.smoke:
        # equivalence: one step of the production body vs the vjp body from
        # identical fresh states must agree (identical math, f32)
        g1, d1, gt1, dt1, s1 = build()
        g2, d2, gt2, dt2, s2 = build()
        ref_step = make_gan_train_step(g1.apply, d1.apply, gt1, dt1,
                                       lambda_adv=LAMBDA_ADV,
                                       lambda_l1=LAMBDA_L1)
        alt_step = make_vjp_gan_step(g2.apply, d2.apply, gt2, dt2,
                                     LAMBDA_ADV, LAMBDA_L1)
        s1o, m1 = ref_step(s1, (inp, tgt), glr, glr, tf, key)
        s2o, m2 = alt_step(s2, (inp, tgt), glr, glr, tf, key)
        for k2 in ("g_total", "d_total"):
            a, b2 = float(m1[k2]), float(m2[k2])
            assert abs(a - b2) <= 1e-6 + 1e-5 * abs(a), (k2, a, b2)
        pdiff = max(float(jnp.abs(x - y).max()) for x, y in zip(
            jax.tree_util.tree_leaves(s1o.gen_params),
            jax.tree_util.tree_leaves(s2o.gen_params)))
        print(json.dumps({"what": "vjp-step equivalence (smoke, f32)",
                          "max_gen_param_delta_after_1_step": pdiff}),
              flush=True)
        assert pdiff < 1e-4, pdiff

    genv, discv, gtxv, dtxv, stv = build()
    vstep = make_vjp_gan_step(genv.apply, discv.apply, gtxv, dtxv,
                              LAMBDA_ADV, LAMBDA_L1)
    vcost = compiled_cost(vstep, stv, (inp, tgt), glr, glr, tf, key)
    stv, mv = vstep(stv, (inp, tgt), glr, glr, tf, key)
    _ = float(mv["g_total"])
    rv = benchmark_chained(
        lambda s: vstep(s, (inp, tgt), glr, glr, tf, key)[0], stv,
        fetch=lambda s: float(s.step), chain=4, iters=iters)
    results.append({
        "what": "GAN step, one-forward vjp",
        "p50_s": round(rv["p50"], 4),
        "delta_vs_default": round((rv["p50"] - t_gan) / t_gan * 100, 1),
        "modeled_flops_ratio_vs_default": round(
            vcost["flops"] / gan_cost["flops"], 3)})

    # --- lever a+b combo: the two independent wins (vjp removes a G
    # forward; save_z trims the bwd's HBM traffic, the binding resource at
    # this shape) should compose — this row decides the production default
    # for the 256px GAN configs
    genc, discc, gtxc, dtxc, stc = build(remat=True, remat_policy="save_z")
    cstep = make_vjp_gan_step(genc.apply, discc.apply, gtxc, dtxc,
                              LAMBDA_ADV, LAMBDA_L1)
    stc, mc = cstep(stc, (inp, tgt), glr, glr, tf, key)
    _ = float(mc["g_total"])
    rc = benchmark_chained(
        lambda s: cstep(s, (inp, tgt), glr, glr, tf, key)[0], stc,
        fetch=lambda s: float(s.step), chain=4, iters=iters)
    results.append({
        "what": "GAN step, vjp + remat save_z",
        "p50_s": round(rc["p50"], 4),
        "delta_vs_default": round((rc["p50"] - t_gan) / t_gan * 100, 1)})

    for row in results:
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
