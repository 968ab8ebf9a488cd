"""Subprocess worker for the REAL multi-process data-parallel test.

Launched by tests/test_sharding.py as N processes (each with 4 virtual CPU
devices) coordinated via jax.distributed — the same code path a 4-host v5e-16
slice runs: per-host loader blocks -> jax.make_array_from_process_local_data ->
shard_map DP train step -> host-aware eval. The reference has no distribution
at all (/root/reference/src/training/trainer.py:20); this validates the build's
multi-host input feed end to end.

Usage: python mp_dp_worker.py <process_id> <num_processes> <port> [devices_per_proc]
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
ndev = int(sys.argv[4]) if len(sys.argv) > 4 else 4
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# go through the PRODUCTION bootstrap path: this is the regression test that
# maybe_init_distributed does not touch the XLA backend before initialize()
# (jax.process_count() there would make initialize raise unconditionally)
os.environ["COORDINATOR_ADDRESS"] = f"localhost:{port}"
os.environ["NUM_PROCESSES"] = str(nproc)
os.environ["PROCESS_ID"] = str(pid)

from pl_convlstm_gan_tpu.parallel.mesh import maybe_init_distributed  # noqa: E402

maybe_init_distributed()
assert jax.distributed.is_initialized()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pl_convlstm_gan_tpu.data import SyntheticSequenceDataset  # noqa: E402
from pl_convlstm_gan_tpu.data.pipeline import (batch_iterator, eval_batches,  # noqa: E402
                                               prefetch_to_device,
                                               put_global_batch, _stack)
from pl_convlstm_gan_tpu.models import ConvLSTMForecaster  # noqa: E402
from pl_convlstm_gan_tpu.parallel import make_mesh, batch_sharding, replicate  # noqa: E402
from pl_convlstm_gan_tpu.parallel.train_parallel import (  # noqa: E402
    make_dp_forecaster_train_step)
from pl_convlstm_gan_tpu.train import (TrainState, aggregate_sequence_eval,  # noqa: E402
                                       make_forecaster_eval_step, make_optimizer)

assert jax.process_count() == nproc
GLOBAL_BATCH = 8
ds = SyntheticSequenceDataset(num_sequences=13, input_frames=2, output_frames=2,
                              image_size=8, seed=7)
mesh = make_mesh()
assert mesh.devices.size == ndev * nproc
sharding = batch_sharding(mesh)

# --- 1. global-batch assembly correctness -----------------------------------
# this host's loader blocks, assembled into global arrays
local_iter = batch_iterator(ds, GLOBAL_BATCH, shuffle=True, seed=3)
global_batches = list(prefetch_to_device(local_iter, size=2, sharding=sharding))
# the expected global batches, computed single-process-style
expected = list(batch_iterator(ds, GLOBAL_BATCH, shuffle=True, seed=3,
                               process_index=0, process_count=1))
assert len(global_batches) == len(expected) == 13 // GLOBAL_BATCH
for got, exp in zip(global_batches, expected):
    for g_arr, e_arr in zip(got, exp):
        assert g_arr.shape == e_arr.shape, (g_arr.shape, e_arr.shape)
        for shard in g_arr.addressable_shards:
            np.testing.assert_array_equal(np.asarray(shard.data),
                                          e_arr[shard.index])
print(f"PROC {pid}: global batch assembly OK", flush=True)

# --- 1b. grain loader path under real multi-process -------------------------
# each host's pipeline reads its interleaved shard; the global arrays must
# carry host p's deterministic grain stream in host p's row block, and the
# per-host streams must partition the (truncated) dataset
from pl_convlstm_gan_tpu.data.pipeline import make_grain_loader  # noqa: E402

g_local = list(make_grain_loader(ds, GLOBAL_BATCH, shuffle=True, seed=5))
g_global = [put_global_batch(b, sharding) for b in g_local]
local_bs = GLOBAL_BATCH // nproc
# every host can recompute any host's expected stream (grain is deterministic)
exp_streams = [list(make_grain_loader(ds, GLOBAL_BATCH, shuffle=True, seed=5,
                                      process_index=i, process_count=nproc))
               for i in range(nproc)]
assert len({len(s) for s in exp_streams}) == 1      # equal batch counts
assert len(g_global) == len(exp_streams[0])
for got, exp in zip(g_global, exp_streams[pid]):
    for g_arr, e_arr in zip(got, exp):
        assert g_arr.shape[0] == GLOBAL_BATCH
        for shard in g_arr.addressable_shards:       # this host's rows
            row0 = shard.index[0].start or 0
            np.testing.assert_array_equal(
                np.asarray(shard.data),
                e_arr[row0 - pid * local_bs:
                      row0 - pid * local_bs + shard.data.shape[0]])
# host streams are disjoint and cover distinct dataset items: fingerprint by
# the raw input bytes of each sequence
fps = [frozenset(b[0][i].tobytes() for b in s for i in range(local_bs))
       for s in exp_streams]
for i in range(nproc):
    for j in range(i + 1, nproc):
        assert not (fps[i] & fps[j]), "grain host shards overlap"
print(f"PROC {pid}: grain multi-process loader OK", flush=True)

# --- 2. DP train step over the assembled batch ------------------------------
model = ConvLSTMForecaster(hidden_dims=(8,), input_frames=2, output_frames=2)
sample = jnp.zeros((GLOBAL_BATCH, 2, 1, 8, 8))
params = model.init(jax.random.PRNGKey(0), sample)  # deterministic on all hosts
tx = make_optimizer(0.5)
state = replicate(TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)),
                  mesh)
step = make_dp_forecaster_train_step(model.apply, tx, mesh)
for batch in global_batches:
    state, m = step(state, batch, jnp.asarray(1e-2), jnp.asarray(0.0),
                    jax.random.PRNGKey(1))
assert np.isfinite(float(m["total"]))
assert int(m["skipped"]) == 0
leaf = jax.tree_util.tree_leaves(state.params)[0]
assert leaf.sharding.is_fully_replicated
print(f"PROC {pid}: DP train step OK (loss {float(m['total']):.4f})", flush=True)

# --- 3. host-aware eval: exact vs an unbatched local computation ------------
eval_step = make_forecaster_eval_step(model.apply)
acc = []
for local_batch, n_valid in eval_batches(ds, GLOBAL_BATCH):
    batch = put_global_batch(local_batch, sharding)
    acc.append(eval_step(state.params, batch, jnp.asarray(n_valid, jnp.int32)))
got = aggregate_sequence_eval(acc)

# unbatched single-host reference on the SAME final params (replicated -> local)
local_params = jax.device_get(state.params)
full = _stack([ds[i] for i in range(len(ds))])
ref = aggregate_sequence_eval([
    eval_step(local_params, tuple(jnp.asarray(x) for x in full),
              jnp.asarray(len(ds), jnp.int32))])
for k in got:
    np.testing.assert_allclose(got[k], ref[k], rtol=1e-5, err_msg=k)
print(f"PROC {pid}: host-aware eval OK (l1 {got['l1']:.5f})", flush=True)

# --- 4. multi-host async checkpoint save + restore round-trip ---------------
import tempfile  # noqa: E402

from pl_convlstm_gan_tpu.train import CheckpointWriter, restore_checkpoint  # noqa: E402

ckpt_dir = os.path.join(tempfile.gettempdir(), f"mp_ckpt_{port}")
w = CheckpointWriter()
dev = {"params": state.params, "opt_state": state.opt_state,
       "step": state.step}
w.save(ckpt_dir, dev, {"epoch": 3, "metric": 0.5})
w.save(ckpt_dir, dev, {"epoch": 4, "metric": 0.4})  # overwrite while in flight
w.wait()
assert os.path.isdir(ckpt_dir) and not os.path.exists(ckpt_dir + ".pending")
restored, host = restore_checkpoint(ckpt_dir, dev)
assert host["epoch"] == 4
for a, bb in zip(jax.tree_util.tree_leaves(state.params),
                 jax.tree_util.tree_leaves(restored["params"])):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))
print(f"PROC {pid}: multi-host async checkpoint OK", flush=True)
print(f"PROC {pid}: ALL OK", flush=True)
