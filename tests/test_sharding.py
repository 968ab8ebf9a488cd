"""Multi-device tests on the 8-way virtual CPU mesh (conftest forces
xla_force_host_platform_device_count=8): shard_map DP steps must (a) run, (b) keep
replicas identical, and (c) match the single-device step numerically."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pl_convlstm_gan_tpu.data import SyntheticDownscalingDataset, batch_iterator
from pl_convlstm_gan_tpu.models import ConvLSTMForecaster, Discriminator, Generator
from pl_convlstm_gan_tpu.parallel import (batch_sharding, make_dp_gan_train_step,
                                          make_dp_generator_train_step, make_mesh,
                                          replicate, shard_batch)
from pl_convlstm_gan_tpu.train import (GANTrainState, TrainState,
                                       make_generator_train_step, make_optimizer)

LOSS_CFG = dict(lambda_point=1.0, lambda_conserve=1.0, lambda_smooth=0.1,
                lambda_temporal=0.05, use_weighted_loss=True, weight_strategy="log")


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def _setup(batch=8):
    ds = SyntheticDownscalingDataset(num_days=32, T=3, lr_size=8, scale_factor=2,
                                     num_stations=4, seed=0)
    model = Generator(hidden_dims=(8, 8), lu_channels=ds.num_lu_classes,
                      scale_factor=2)
    batch_np = next(batch_iterator(ds, batch, shuffle=False))
    batch_j = tuple(jnp.asarray(x) for x in batch_np)
    params = model.init(jax.random.PRNGKey(0), *batch_j[:3])
    tx = make_optimizer(0.5)
    return model, tx, params, batch_j


def test_dp_step_runs_and_matches_single_device():
    model, tx, params, batch = _setup(batch=8)
    mesh = make_mesh()
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)

    # single-device reference trajectory (steps donate state -> use copies)
    p1 = copy(params)
    state_s = TrainState(p1, tx.init(p1), jnp.zeros((), jnp.int32))
    step_s = make_generator_train_step(model.apply, tx, LOSS_CFG)
    state_s, m_s = step_s(state_s, batch, jnp.asarray(1e-2))

    # 8-way DP trajectory from identical init
    p2 = copy(params)
    state_d = TrainState(p2, tx.init(p2), jnp.zeros((), jnp.int32))
    state_d = replicate(state_d, mesh)
    sharded_batch = shard_batch(batch, mesh)
    step_d = make_dp_generator_train_step(model.apply, tx, LOSS_CFG, mesh)
    state_d, m_d = step_d(state_d, sharded_batch, jnp.asarray(1e-2))

    # loss metric: DP reports the mean of shard means; with equal shard sizes and
    # mean-reduced losses over identical data this equals the global value for the
    # grid terms. Compare the updated parameters — the real invariant.
    for a, b in zip(jax.tree_util.tree_leaves(state_s.params),
                    jax.tree_util.tree_leaves(state_d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    assert int(m_d["skipped"]) == 0


def test_dp_matches_single_device_with_nan_stations():
    """DP exactness under UNEVEN valid-station counts: NaN observations make
    per-shard mask counts differ (one shard has zero), where a naive pmean of
    per-shard count-normalized point losses diverges from the single-device
    global-batch semantics (mean-of-ratios vs ratio-of-means). The DP body
    normalizes by the GLOBAL count (train/steps.py generator_step_body), so
    params AND the point/rmse metrics must match the single-device step."""
    model, tx, params, batch = _setup(batch=8)
    sv = np.asarray(batch[4]).copy()          # [B, T, N]
    sv[0] = np.nan                            # shard 0: zero valid entries
    sv[1, :, :-1] = np.nan                    # shard 1: one station left
    sv[2, 1:] = np.nan                        # shard 2: one timestep left
    batch = batch[:4] + (jnp.asarray(sv),)
    mesh = make_mesh()
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)

    p1 = copy(params)
    state_s = TrainState(p1, tx.init(p1), jnp.zeros((), jnp.int32))
    step_s = make_generator_train_step(model.apply, tx, LOSS_CFG)
    state_s, m_s = step_s(state_s, batch, jnp.asarray(1e-2))

    p2 = copy(params)
    state_d = replicate(TrainState(p2, tx.init(p2), jnp.zeros((), jnp.int32)),
                        mesh)
    step_d = make_dp_generator_train_step(model.apply, tx, LOSS_CFG, mesh)
    state_d, m_d = step_d(state_d, shard_batch(batch, mesh), jnp.asarray(1e-2))

    assert int(m_d["skipped"]) == 0
    for key in ("total", "point", "rmse"):
        np.testing.assert_allclose(float(m_s[key]), float(m_d[key]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_s.params),
                    jax.tree_util.tree_leaves(state_d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_dp_global_nan_skip():
    """Poison ONE shard's data: the *global* update must be skipped."""
    model, tx, params, batch = _setup(batch=8)
    mesh = make_mesh()
    bad = (np.asarray(batch[0]).copy(),) + tuple(np.asarray(x) for x in batch[1:])
    bad[0][0, 0] = np.nan  # lands in shard 0 only
    # snapshot as host copies BEFORE the step: replicate() may alias the local
    # shard, and the donated step then deletes the aliased buffer
    before = jax.tree_util.tree_map(lambda x: np.array(x, copy=True), params)
    state = replicate(TrainState(params, tx.init(params),
                                 jnp.zeros((), jnp.int32)), mesh)
    step = make_dp_generator_train_step(model.apply, tx, LOSS_CFG, mesh)
    new_state, m = step(state, shard_batch(tuple(map(jnp.asarray, bad)), mesh),
                        jnp.asarray(1e-2))
    assert float(m["skipped"]) == 1.0
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dp_gan_step_runs():
    gen = ConvLSTMForecaster(hidden_dims=(8,), input_frames=2, output_frames=2)
    disc = Discriminator(features=(8,))
    mesh = make_mesh()
    b, h = 8, 16
    rng = np.random.default_rng(0)
    inputs = jnp.asarray(rng.random((b, 2, 1, h, h)).astype(np.float32))
    targets = jnp.asarray(rng.random((b, 2, 1, h, h)).astype(np.float32))
    gp = gen.init(jax.random.PRNGKey(0), inputs)
    dp = disc.init(jax.random.PRNGKey(1), targets)
    gtx, dtx = make_optimizer(0.5), make_optimizer(0.5)
    state = GANTrainState(gp, dp, gtx.init(gp), dtx.init(dp),
                          jnp.zeros((), jnp.int32))
    state = replicate(state, mesh)
    step = make_dp_gan_train_step(gen.apply, disc.apply, gtx, dtx, mesh,
                                  lambda_adv=0.01, lambda_l1=1.0)
    batch = shard_batch((inputs, targets), mesh)
    state, m = step(state, batch, jnp.asarray(1e-3), jnp.asarray(1e-3),
                    jnp.asarray(0.5), jax.random.PRNGKey(2))
    assert np.isfinite(float(m["g_total"])) and np.isfinite(float(m["d_total"]))
    assert int(state.step) == 1
    # params replicated identically across devices
    leaf = jax.tree_util.tree_leaves(state.gen_params)[0]
    assert leaf.sharding.is_fully_replicated


def test_tensor_parallel_cell_matches_single_device(rng):
    """Channel-TP ConvLSTM cell (Megatron-style column parallel) must match the
    single-device cell exactly on reordered-sharded params."""
    from pl_convlstm_gan_tpu.ops.convlstm import ConvLSTMParams, convlstm_step_xla
    from pl_convlstm_gan_tpu.parallel.tensor_parallel import (
        make_tp_convlstm_step, shard_cell_params)
    from jax.sharding import Mesh
    import numpy as onp

    b, hgt, wid, cx, ch = 2, 8, 8, 3, 16
    x = jnp.asarray(rng.standard_normal((b, hgt, wid, cx), dtype=onp.float32))
    h = jnp.asarray(rng.standard_normal((b, hgt, wid, ch), dtype=onp.float32))
    c = jnp.asarray(rng.standard_normal((b, hgt, wid, ch), dtype=onp.float32))
    kern = jnp.asarray(
        rng.standard_normal((3, 3, cx + ch, 4 * ch), dtype=onp.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal(4 * ch, dtype=onp.float32) * 0.1)
    params = ConvLSTMParams(kern, bias)

    h_ref, c_ref = convlstm_step_xla(params, x, h, c)

    mesh = Mesh(np.asarray(jax.devices()), ("model",))
    tp_params = shard_cell_params(params, mesh.devices.size)
    step = make_tp_convlstm_step(mesh, "model")
    h_tp, c_tp = step(tp_params, x, h, c)

    np.testing.assert_allclose(np.asarray(h_tp), np.asarray(h_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_tp), np.asarray(c_ref), atol=1e-5)


# ---------------------------------------------------------------------------
# multi-host data-parallel input feed (round-2: VERDICT.md next-round item 1)
# ---------------------------------------------------------------------------

def test_process_sharded_train_batches_disjoint_and_complete():
    """Per-host loader blocks of every global batch are disjoint, complete, and
    reassemble (in block order) into the exact single-process global batch."""
    from pl_convlstm_gan_tpu.data import SyntheticSequenceDataset
    ds = SyntheticSequenceDataset(num_sequences=35, input_frames=2,
                                  output_frames=2, image_size=8, seed=1)
    P, gbs = 4, 8
    single = list(batch_iterator(ds, gbs, shuffle=True, seed=9,
                                 process_index=0, process_count=1))
    per_proc = [list(batch_iterator(ds, gbs, shuffle=True, seed=9,
                                    process_index=p, process_count=P))
                for p in range(P)]
    assert all(len(b) == len(single) for b in per_proc)
    for bi, ref in enumerate(single):
        for arr_i, ref_arr in enumerate(ref):
            blocks = [per_proc[p][bi][arr_i] for p in range(P)]
            assert all(b.shape[0] == gbs // P for b in blocks)
            np.testing.assert_array_equal(np.concatenate(blocks, axis=0),
                                          ref_arr)


def test_process_sharded_eval_batches_match_global():
    """eval_batches per-host blocks reassemble the global wrap-padded batches
    with identical n_valid on every host."""
    from pl_convlstm_gan_tpu.data import SyntheticSequenceDataset
    from pl_convlstm_gan_tpu.data.pipeline import eval_batches
    ds = SyntheticSequenceDataset(num_sequences=13, input_frames=2,
                                  output_frames=2, image_size=8, seed=1)
    P, gbs = 2, 8
    single = list(eval_batches(ds, gbs, process_index=0, process_count=1))
    per_proc = [list(eval_batches(ds, gbs, process_index=p, process_count=P))
                for p in range(P)]
    assert [nv for _, nv in per_proc[0]] == [nv for _, nv in single] == [8, 5]
    for bi, (ref, nv_ref) in enumerate(single):
        for p in range(P):
            assert per_proc[p][bi][1] == nv_ref
        for arr_i, ref_arr in enumerate(ref):
            blocks = [per_proc[p][bi][0][arr_i] for p in range(P)]
            np.testing.assert_array_equal(np.concatenate(blocks, axis=0),
                                          ref_arr)


def test_put_global_batch_single_process_matches_device_put():
    mesh = make_mesh()
    from pl_convlstm_gan_tpu.data.pipeline import put_global_batch
    x = (np.arange(16, dtype=np.float32).reshape(8, 2),)
    s = batch_sharding(mesh)
    out = put_global_batch(x, s)
    ref = jax.device_put(x[0], s)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref))
    assert out[0].sharding == ref.sharding


def _free_port():
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _mp_env():
    here = os.path.dirname(os.path.abspath(__file__))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.path.dirname(here)
    return env, here


def _run_mp_workers(nproc: int, ndev: int, timeout: int = 420):
    import subprocess
    import sys

    port = _free_port()
    env, here = _mp_env()
    worker = os.path.join(here, "mp_dp_worker.py")
    procs = [subprocess.Popen([sys.executable, worker, str(i), str(nproc),
                               str(port), str(ndev)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env, cwd=os.path.dirname(here))
             for i in range(nproc)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "ALL OK" in out


def test_multiprocess_dp_end_to_end():
    """REAL 2-process jax.distributed run (4 virtual CPU devices each = 8
    global): per-host loader (plain AND grain) ->
    make_array_from_process_local_data -> shard_map DP step -> host-aware
    eval -> multi-host async checkpoint, all verified in mp_dp_worker.py."""
    _run_mp_workers(2, 4)


def test_multiprocess_dp_4x2():
    """Same end-to-end story at a 4-process x 2-device topology (the v5e-16
    4-host shape scaled down): process-count-dependent logic — interleaved
    grain shards, per-host block arithmetic, promotion barriers — must not
    be 2-host-specific."""
    _run_mp_workers(4, 2, timeout=600)


def test_multiprocess_kill_and_resume(tmp_path):
    """Operational crash recovery under REAL multi-process: two trainer
    processes (grain loader, periodic async 'latest' saves) are SIGTERM'd
    mid-run, then relaunched through the actual CLI with --resume. The
    relaunch must recover the newest complete checkpoint (promotion barriers,
    pending-dir recovery with process-0 gating) and finish the run."""
    import signal
    import subprocess
    import sys
    import time

    import yaml

    out_dir = str(tmp_path / "out")
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump({
            "data": {"source": "synthetic", "synthetic_num_sequences": 32,
                     "synthetic_image_size": 8, "loader": "grain"},
            "model": {"family": "forecaster", "hidden_dims": [8],
                      "input_frames": 2, "output_frames": 2},
            "training": {"batch_size": 8, "epochs": 6,
                         "learning_rate": 1e-3, "use_split": True,
                         "use_early_stopping": False},
            "output": {"output_dir": out_dir, "log_interval": 100,
                       "save_model_interval": 1},
        }, f)
    env_base, here = _mp_env()
    repo = os.path.dirname(here)

    def launch(port, resume):
        procs = []
        for i in range(2):
            env = dict(env_base, JAX_PLATFORMS="cpu",
                       XLA_FLAGS="--xla_force_host_platform_device_count=4",
                       COORDINATOR_ADDRESS=f"localhost:{port}",
                       NUM_PROCESSES="2", PROCESS_ID=str(i))
            cmd = [sys.executable, os.path.join(repo, "main.py"),
                   "--config", cfg_path] + (["--resume"] if resume else [])
            procs.append(subprocess.Popen(
                cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env, cwd=repo))
        return procs

    # phase 1: train, then kill BOTH processes once a periodic save exists
    procs = launch(_free_port(), resume=False)
    latest = os.path.join(out_dir, "latest")
    deadline = time.time() + 420
    have_ckpt = False
    while time.time() < deadline:
        complete = os.path.isdir(os.path.join(latest, "state"))
        pending_complete = os.path.isdir(
            os.path.join(latest + ".pending", "state"))
        if complete or pending_complete:
            have_ckpt = True
            break
        if all(p.poll() is not None for p in procs):
            break   # finished before we could kill — still fine, resume below
        time.sleep(1.0)
    for p in procs:
        if p.poll() is None:
            p.send_signal(signal.SIGTERM)   # hard stop: no atexit promotion
    outs = [p.communicate(timeout=60)[0] for p in procs]
    assert have_ckpt, "no checkpoint appeared before timeout:\n" + outs[0]

    # phase 2: relaunch with --resume; must recover and complete all 6 epochs
    procs = launch(_free_port(), resume=True)
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"resume worker {i} failed:\n{out}"
        assert "Resuming from" in out
        assert "Restored checkpoint from" in out
        assert "Training completed" in out
    # process-0-owned artifacts: full history through the final epoch
    import json
    with open(os.path.join(out_dir, "history.json")) as f:
        hist = json.load(f)
    assert hist["epoch"][-1] == 5
    metrics = [json.loads(l) for l in
               open(os.path.join(out_dir, "metrics.jsonl"))]
    assert metrics[-1]["epoch"] == 5
