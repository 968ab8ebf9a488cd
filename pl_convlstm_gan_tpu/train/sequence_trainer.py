"""SequenceTrainer — training orchestration for the forecaster and GAN families
(north-star configs #1-#5): stacked-ConvLSTM rollout models on frame sequences, with
optional adversarial training, scheduled sampling, bf16 compute, SSIM eval, plateau
LR scheduling, early stopping, best-checkpoint save/restore, and shard_map data
parallelism.

Shares all infrastructure with the parity ``Trainer`` (same scheduler/early-stop/
checkpoint/pipeline components); only the model family, losses, and step functions
differ. The reference repo has no equivalent (its only model reconstructs aligned
timesteps); this is the extension family the driver benchmarks."""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, load_config
from ..data import (SyntheticSequenceDataset, batch_iterator, prefetch_to_device,
                    split_dataset_random)
from ..models import ConvLSTMForecaster, Discriminator
from ..parallel.mesh import (batch_sharding, make_mesh, make_mesh_2d,
                             replicate)
from ..utils.visualization import (plot_sequence_comparison,
                                   plot_training_curves)
from .checkpoint import CheckpointWriter, restore_checkpoint
from .early_stopping import EarlyStopping
from .plateau import ReduceLROnPlateau
from .steps import (GANTrainState, TrainState, make_forecaster_eval_step,
                    make_forecaster_train_step, make_gan_train_step, make_optimizer)


class SequenceTrainer:
    def __init__(self, config_name: str = "default",
                 config: Optional[Config] = None):
        self.config = config if config is not None else load_config(config_name)
        self.is_gan = self.config.model.family == "gan"

        self.output_dir = self.config.output.output_dir
        os.makedirs(self.output_dir, exist_ok=True)

        self.history = {"epoch": [], "total_loss": [], "val_l1": [], "val_ssim": [],
                        "learning_rate": []}
        if self.is_gan:
            self.history.update({"g_loss": [], "d_loss": []})
        self.best_metric = float("inf")
        self.best_epoch = -1
        self.start_epoch = 0
        # async checkpoint writer: serialization overlaps the next epoch
        self._ckpt_writer = CheckpointWriter()

        tc = self.config.training
        self.early_stopping = EarlyStopping(
            patience=tc.early_stopping_patience,
            min_delta=tc.early_stopping_min_delta, mode="min",
            verbose=True) if tc.use_early_stopping else None

        mcfg = self.config.mesh
        self.n_model = mcfg.model_axis
        self.tensor_parallel = self.n_model > 1
        if self.tensor_parallel:
            # 2-D (data, model) mesh: cells channel-sharded over the model
            # axis, batch over the data axis, one GSPMD program (DP grad
            # reduction inserted by the partitioner) — parallel/tensor_parallel
            self.mesh = make_mesh_2d(mcfg.data_axis, self.n_model,
                                     (mcfg.axis_name, mcfg.model_axis_name))
            self.n_data = int(self.mesh.shape[mcfg.axis_name])
            self.data_parallel = False   # DP rides the same GSPMD program
            print(f"DPxTP mesh: {dict(self.mesh.shape)}")
        else:
            self.mesh = make_mesh(mcfg.data_axis, mcfg.axis_name)
            self.n_data = self.mesh.devices.size
            self.data_parallel = self.n_data > 1
            if self.data_parallel:
                print(f"Data parallelism over {self.n_data} devices")
        self.n_devices = self.mesh.devices.size
        # batches are placed sharded on the (configurable) data axis whenever
        # a mesh is in play
        self.batch_axis = mcfg.axis_name
        self.batch_sharded = self.data_parallel or self.tensor_parallel

    # ------------------------------------------------------------------ data
    def setup_data(self):
        dc = self.config.data
        mc = self.config.model
        if dc.source == "frames":
            from ..data.frames import NpyFramesDataset
            full = NpyFramesDataset(
                dc.frames_path, input_frames=mc.input_frames,
                output_frames=mc.output_frames,
                stride=dc.frames_stride or None, scale=dc.frames_scale)
            print(f"Frames dataset: {len(full)} sequences from "
                  f"{dc.frames_path}")
        else:
            full = SyntheticSequenceDataset(
                num_sequences=dc.synthetic_num_sequences,
                input_frames=mc.input_frames, output_frames=mc.output_frames,
                image_size=dc.synthetic_image_size, seed=dc.seed)
        self._full_dataset = full
        if self.config.training.use_split:
            self.train_dataset, self.val_dataset, self.test_dataset = \
                split_dataset_random(full, seed=dc.split_seed)
        else:
            self.train_dataset, self.val_dataset, self.test_dataset = full, None, None
        return full

    def _loader(self, dataset, shuffle: bool, epoch: int = 0):
        bs = self.config.training.batch_size
        if self.batch_sharded and bs % self.n_data != 0:
            raise ValueError(f"batch_size {bs} not divisible by {self.n_data}")
        if self.config.data.loader == "grain":
            from ..data.pipeline import make_grain_loader
            it = make_grain_loader(dataset, bs, shuffle=shuffle,
                                   seed=self.config.training.seed + epoch,
                                   worker_count=self.config.data.worker_count)
        else:
            it = batch_iterator(dataset, bs, shuffle=shuffle,
                                seed=self.config.training.seed, drop_last=True,
                                epoch=epoch)
        sharding = (batch_sharding(self.mesh, self.batch_axis)
                    if self.batch_sharded else None)
        return prefetch_to_device(it, size=2, sharding=sharding)

    # ----------------------------------------------------------------- model
    def setup_model(self, dataset=None):
        mc = self.config.model
        tc = self.config.training
        dtype = jnp.bfloat16 if self.config.precision.compute_dtype == "bfloat16" \
            else None

        self.model = ConvLSTMForecaster(
            hidden_dims=tuple(mc.hidden_dims), input_frames=mc.input_frames,
            output_frames=mc.output_frames, in_channels=mc.in_channels,
            kernel_size=mc.kernel_size,
            convlstm_impl="xla" if mc.convlstm_impl == "auto" else mc.convlstm_impl,
            remat=mc.remat, remat_policy=mc.remat_policy,
            scan_unroll=mc.scan_unroll, dtype=dtype,
            tp_shards=self.n_model if self.tensor_parallel else 1,
            tp_mesh=self.mesh if self.tensor_parallel else None,
            tp_axis=self.config.mesh.model_axis_name)

        b = tc.batch_size
        ds = dataset or getattr(self, "_full_dataset", None)
        if ds is not None:
            # derive the frame geometry from the actual data (frames source
            # has no synthetic_image_size)
            in_shape = np.asarray(ds[0][0]).shape          # [T_in, C, H, W]
            sample_in = jnp.zeros((b, *in_shape))
        else:
            h = self.config.data.synthetic_image_size
            sample_in = jnp.zeros((b, mc.input_frames, mc.in_channels, h, h))
        params = self.model.init(jax.random.PRNGKey(tc.seed), sample_in)
        self.tx = make_optimizer(tc.grad_clip_norm)

        self.scheduler = ReduceLROnPlateau(
            lr=tc.learning_rate, mode="min", factor=tc.scheduler_factor,
            patience=tc.scheduler_patience, verbose=True)

        if self.is_gan:
            self.disc = Discriminator(features=tuple(mc.disc_features), dtype=dtype)
            if ds is not None:
                sample_tgt = jnp.zeros((b, *np.asarray(ds[0][1]).shape))
            else:
                sample_tgt = jnp.zeros((b, mc.output_frames, mc.in_channels,
                                        h, h))
            dparams = self.disc.init(jax.random.PRNGKey(tc.seed + 1), sample_tgt)
            self.disc_tx = make_optimizer(tc.grad_clip_norm)
            self.disc_lr = tc.disc_learning_rate or tc.learning_rate
            state = GANTrainState(params, dparams, self.tx.init(params),
                                  self.disc_tx.init(dparams),
                                  jnp.zeros((), jnp.int32))
            if self.tensor_parallel:
                state, shardings = self._place_tp_state(state)
                self.train_step = make_gan_train_step(
                    self.model.apply, self.disc.apply, self.tx, self.disc_tx,
                    tc.lambda_adv, tc.lambda_l1, tc.label_smoothing,
                    shardings=shardings, impl=tc.gan_step_impl)
            elif self.data_parallel:
                from ..parallel.train_parallel import make_dp_gan_train_step
                self.train_step = make_dp_gan_train_step(
                    self.model.apply, self.disc.apply, self.tx, self.disc_tx,
                    self.mesh, tc.lambda_adv, tc.lambda_l1,
                    self.config.mesh.axis_name, tc.label_smoothing,
                    impl=tc.gan_step_impl)
            else:
                self.train_step = make_gan_train_step(
                    self.model.apply, self.disc.apply, self.tx, self.disc_tx,
                    tc.lambda_adv, tc.lambda_l1, tc.label_smoothing,
                    impl=tc.gan_step_impl)
        else:
            state = TrainState(params, self.tx.init(params),
                               jnp.zeros((), jnp.int32))
            if self.tensor_parallel:
                state, shardings = self._place_tp_state(state)
                self.train_step = make_forecaster_train_step(
                    self.model.apply, self.tx, shardings=shardings)
            elif self.data_parallel:
                from ..parallel.train_parallel import make_dp_forecaster_train_step
                self.train_step = make_dp_forecaster_train_step(
                    self.model.apply, self.tx, self.mesh,
                    self.config.mesh.axis_name)
            else:
                self.train_step = make_forecaster_train_step(self.model.apply,
                                                             self.tx)
        if self.data_parallel:
            state = replicate(state, self.mesh)
        self.state = state
        thresholds = tuple(tc.eval_thresholds) if tc.eval_thresholds else None
        self.eval_step = make_forecaster_eval_step(self.model.apply, thresholds,
                                                   sharpness=tc.eval_sharpness)

        if tc.resume_from:
            self.restore(tc.resume_from)

    # --------------------------------------------------------------------- tp
    def _place_tp_state(self, state):
        """Place a train state over the 2-D (data, model) mesh: cell kernels/
        biases (and their adam moments) sharded on the model axis, everything
        else replicated. Returns (placed_state, shardings_for_the_step) —
        params come out of init in the shard-major per-gate layout already
        (the model was built with tp_shards > 1)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.tensor_parallel import tp_state_shardings
        axis = self.config.mesh.model_axis_name
        state_sh = tp_state_shardings(state, self.mesh, axis)
        state = jax.device_put(state, state_sh)
        rep = NamedSharding(self.mesh, P())
        return state, (state_sh,
                       batch_sharding(self.mesh, self.batch_axis), rep)

    def _tp_layout(self, tree, to_canonical: bool):
        """Convert every cell kernel/bias leaf (params AND adam moments)
        between the TP shard-major layout and the canonical [i|f|o|g] layout.
        Checkpoints are ALWAYS canonical so they interchange with
        single-device runs, eval/predict/export tools, and different
        model_axis sizes."""
        from ..parallel.tensor_parallel import tp_permute_tree
        return tp_permute_tree(tree, self.n_model, inverse=to_canonical)

    # ------------------------------------------------------------- schedules
    def teacher_forcing_prob(self, epoch: int) -> float:
        """Linear scheduled-sampling decay 1 -> 0 over sampling_decay_epochs
        (north-star config #4)."""
        tc = self.config.training
        if not tc.scheduled_sampling:
            return 0.0
        return float(np.clip(1.0 - epoch / max(tc.sampling_decay_epochs, 1),
                             0.0, 1.0))

    # ------------------------------------------------------------------ eval
    def _run_eval(self, dataset) -> Optional[Dict[str, float]]:
        """Shared eval driver: wrap-padding masked inside the jit, sums
        aggregated exactly on host (skill scores from GLOBAL contingency counts)
        — metrics are batch-size-invariant."""
        if dataset is None or len(dataset) == 0:
            return None
        from ..data.pipeline import eval_batches, put_global_batch
        from .steps import aggregate_sequence_eval
        params = self.state.gen_params if self.is_gan else self.state.params
        sharding = (batch_sharding(self.mesh, self.batch_axis)
                    if self.batch_sharded else None)
        acc = []
        for batch, n_valid in eval_batches(dataset,
                                           self.config.training.batch_size):
            if sharding is not None:
                batch = put_global_batch(batch, sharding)
            acc.append(self.eval_step(params, batch,
                                      jnp.asarray(n_valid, jnp.int32)))
        return aggregate_sequence_eval(acc)

    def validate(self) -> Optional[Dict[str, float]]:
        return self._run_eval(self.val_dataset)

    def evaluate_test(self) -> Optional[Dict[str, float]]:
        """All eval metrics (L1, SSIM, optional POD/FAR/CSI/HSS@threshold) on the
        held-out test split (free-running rollout)."""
        return self._run_eval(self.test_dataset)

    # ----------------------------------------------------------------- train
    def train_epoch(self, epoch: int) -> Dict[str, float]:
        tc = self.config.training
        tf_prob = jnp.asarray(self.teacher_forcing_prob(epoch), jnp.float32)
        lr = jnp.asarray(self.scheduler.lr, jnp.float32)
        rng = jax.random.PRNGKey(tc.seed * 100_003 + epoch)
        metrics_acc = []
        for i, batch in enumerate(self._loader(self.train_dataset, shuffle=True,
                                               epoch=epoch)):
            rng, step_rng = jax.random.split(rng)
            if i == 0 and epoch == self.start_epoch and \
                    self.config.debug.log_compiled_cost:
                from ..utils.profiling import log_compiled_cost
                fam = "gan" if self.is_gan else "forecaster"
                extra = ((jnp.asarray(self.disc_lr, jnp.float32),)
                         if self.is_gan else ())
                log_compiled_cost(f"{fam} train step", self.train_step,
                                  self.state, batch, lr, *extra, tf_prob,
                                  step_rng)
            if self.is_gan:
                self.state, m = self.train_step(
                    self.state, batch, lr, jnp.asarray(self.disc_lr, jnp.float32),
                    tf_prob, step_rng)
            else:
                self.state, m = self.train_step(self.state, batch, lr, tf_prob,
                                                step_rng)
            metrics_acc.append(m)
            if i % self.config.output.log_interval == 0:
                # ONE batched fetch — per-key float(v) would pay one ~26 ms
                # device sync per metric through the tunnel (CLAUDE.md)
                mf = {k: float(v) for k, v in
                      zip(m.keys(), jax.device_get(list(m.values())))}
                if self.is_gan:
                    print(f"Epoch {epoch} | G: {mf['g_total']:.4f} "
                          f"(adv {mf['g_adv']:.4f}, l1 {mf['g_l1']:.4f}) | "
                          f"D: {mf['d_total']:.4f} | tf_prob {float(tf_prob):.2f}")
                else:
                    print(f"Epoch {epoch} | L1: {mf['total']:.4f} | "
                          f"tf_prob {float(tf_prob):.2f}")
        if not metrics_acc:
            raise ValueError(
                f"No training batches: dataset has {len(self.train_dataset)} "
                f"samples < batch_size {self.config.training.batch_size}")
        from .steps import aggregate_epoch_metrics
        return aggregate_epoch_metrics(metrics_acc)

    def train(self):
        import time
        self.setup_data()
        self.setup_model()
        for epoch in range(self.start_epoch, self.config.training.epochs):
            epoch_t0 = time.perf_counter()
            avg = self.train_epoch(epoch)
            epoch_s = time.perf_counter() - epoch_t0

            self.history["epoch"].append(epoch)
            train_loss = avg["g_total"] if self.is_gan else avg["total"]
            self.history["total_loss"].append(train_loss)
            if self.is_gan:
                self.history["g_loss"].append(avg["g_total"])
                self.history["d_loss"].append(avg["d_total"])
            self.history["learning_rate"].append(self.scheduler.lr)

            val = self.validate()
            if val:
                self.history["val_l1"].append(val["l1"])
                self.history["val_ssim"].append(val["ssim"])
                print(f"Epoch {epoch} | Train: {train_loss:.4f} | "
                      f"Val L1: {val['l1']:.4f} | Val SSIM: {val['ssim']:.4f} | "
                      f"{epoch_s:.1f}s")
                current = val["l1"]
            else:
                # NaN-pad so every history series stays aligned with 'epoch'
                # (plots silently drop length-mismatched series otherwise)
                self.history["val_l1"].append(float("nan"))
                self.history["val_ssim"].append(float("nan"))
                print(f"Epoch {epoch} | Train: {train_loss:.4f}")
                current = train_loss
            # log BEFORE scheduler.step so the record carries the lr this
            # epoch actually trained at (matches history["learning_rate"])
            self._log_epoch_metrics(epoch, epoch_s, avg, val)
            self.scheduler.step(current)

            should_save = False
            if self.early_stopping is not None:
                if self.early_stopping(current, epoch):
                    should_save = True
            elif current < self.best_metric:
                should_save = True
            if should_save:
                self.best_metric = current
                self.best_epoch = epoch
                self.save_best(epoch, current)
                print(f"New best model saved! Epoch {epoch + 1}, "
                      f"metric {current:.4f}")
            interval = self.config.output.save_model_interval
            if interval and (epoch + 1) % interval == 0:
                self._ckpt_writer.save(os.path.join(self.output_dir, "latest"),
                                       self._device_state_dict(),
                                       self._host_state(epoch, current))

            if self.early_stopping is not None and self.early_stopping.early_stop:
                print(f"Early stopping at epoch {epoch + 1}")
                break

        self._ckpt_writer.wait()  # finalize any in-flight checkpoint
        from ..utils.metrics_log import dump_history, is_primary_host
        if is_primary_host():  # run artifacts are owned by process 0
            val = self.history.get("val_l1", [])
            rmse_series = val if len(val) == len(self.history["epoch"]) \
                else self.history["total_loss"]
            plot_training_curves(
                {"epoch": self.history["epoch"],
                 "total_loss": self.history["total_loss"],
                 "rmse": rmse_series,
                 "learning_rate": self.history["learning_rate"]},
                save_path=os.path.join(self.output_dir,
                                       "final_training_curves.png"),
                dpi=self.config.output.plot_dpi)
            self._final_sequence_plot()
        dump_history(self.output_dir, self.history)
        print(f"\nTraining completed. Best epoch {self.best_epoch + 1}, "
              f"metric {self.best_metric:.4f}")
        return self.history

    def _log_epoch_metrics(self, epoch, epoch_s, train_avg, val_metrics):
        """One strict-JSON line per epoch to <output_dir>/metrics.jsonl
        (process 0 only under multi-host)."""
        from ..utils.metrics_log import append_metrics_line
        rec = {"epoch": epoch, "epoch_seconds": round(epoch_s, 3),
               "lr": self.scheduler.lr, "tf_prob": self.teacher_forcing_prob(epoch),
               **{f"train_{k}": float(v) for k, v in train_avg.items()}}
        if val_metrics:
            rec.update({f"val_{k}": float(v) for k, v in val_metrics.items()})
        append_metrics_line(self.output_dir, rec)

    def _final_sequence_plot(self):
        """Frame-grid comparison on one val/train sample (visual sanity)."""
        try:
            ds = self.val_dataset or self.train_dataset
            inputs, targets = ds[0]
            params = self.state.gen_params if self.is_gan else self.state.params
            pred = self.model.apply(params, jnp.asarray(inputs[None]))
            plot_sequence_comparison(
                inputs, targets, np.asarray(pred)[0],
                save_path=os.path.join(self.output_dir,
                                       "final_sequence_comparison.png"),
                dpi=self.config.output.plot_dpi // 2 or 100)
        except Exception as e:  # plotting must never kill a finished run
            print(f"Sequence plot skipped: {e}")

    # ------------------------------------------------------------ checkpoint
    def _device_state_dict(self):
        if self.is_gan:
            d = {"gen_params": self.state.gen_params,
                 "disc_params": self.state.disc_params,
                 "gen_opt_state": self.state.gen_opt_state,
                 "disc_opt_state": self.state.disc_opt_state,
                 "step": self.state.step}
        else:
            d = {"params": self.state.params, "opt_state": self.state.opt_state,
                 "step": self.state.step}
        if self.tensor_parallel:
            d = self._tp_layout(d, to_canonical=True)
        return d

    def _host_state(self, epoch: int, metric: float) -> Dict:
        return {"epoch": epoch, "metric": metric, "history": self.history,
                # historical best, kept separate from this checkpoint's own
                # metric so resuming from 'latest' never lowers the best bar
                "best_metric": self.best_metric, "best_epoch": self.best_epoch,
                "scheduler": self.scheduler.state_dict(),
                "early_stopping": (self.early_stopping.state_dict()
                                   if self.early_stopping else None)}

    def save_best(self, epoch: int, metric: float):
        """Async best-checkpoint save (overlaps the next epoch's compute)."""
        self._ckpt_writer.save(os.path.join(self.output_dir, "best_model"),
                               self._device_state_dict(),
                               self._host_state(epoch, metric))

    def restore(self, path: str):
        self._ckpt_writer.wait()  # finalize any in-flight save of this path
        target = self._device_state_dict()
        device_state, host_state = restore_checkpoint(path, target)
        if self.tensor_parallel:
            # checkpoint is canonical; back to the TP shard-major layout
            device_state = self._tp_layout(device_state, to_canonical=False)
        if self.is_gan:
            self.state = GANTrainState(
                device_state["gen_params"], device_state["disc_params"],
                device_state["gen_opt_state"], device_state["disc_opt_state"],
                device_state["step"])
        else:
            self.state = TrainState(device_state["params"],
                                    device_state["opt_state"],
                                    device_state["step"])
        if self.tensor_parallel:
            self.state, _ = self._place_tp_state(self.state)
        if self.data_parallel:
            self.state = replicate(self.state, self.mesh)
        self.history = host_state["history"]
        self.best_metric = host_state.get("best_metric", host_state["metric"])
        self.best_epoch = host_state.get("best_epoch", host_state["epoch"])
        self.start_epoch = host_state["epoch"] + 1
        self.scheduler.load_state_dict(host_state["scheduler"])
        if self.early_stopping is not None and host_state.get("early_stopping"):
            self.early_stopping.load_state_dict(host_state["early_stopping"])
        print(f"Restored checkpoint from {path} (epoch {host_state['epoch']})")
