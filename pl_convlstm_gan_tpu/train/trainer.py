"""Trainer — end-to-end orchestration mirroring the reference's public surface
(``/root/reference/src/training/trainer.py:16-449``): ``Trainer(config_name)``,
``.setup_data()``, ``.setup_model(dataset)``, ``.train_epoch(epoch)``, ``.validate()``,
``.compute_station_rmse(...)``, ``.train()``, the same ``history`` keys
(trainer.py:27-36) and per-interval log lines (trainer.py:332-335).

TPU-first restructure:
- the epoch loop stays on host, but the whole batch body (forward, loss, NaN-skip,
  clip, Adam, station RMSE) is ONE jitted step (train/steps.py) with donated state;
- learning rate is a dynamic scalar from the host-side ReduceLROnPlateau port
  (train/plateau.py) — no recompile on LR change;
- batches are stacked on host and prefetched to device 2 deep
  (data/pipeline.py), replacing the reference's per-tensor ``.to(device)``
  (trainer.py:287-288);
- with >1 device, the step is the explicit ``shard_map`` DP version
  (parallel/train_parallel.py) and batches are placed batch-sharded over the mesh;
- checkpointing adds the restore path the reference lacks (train/checkpoint.py).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, load_config
from ..data import (SyntheticDownscalingDataset, FenheDataset, batch_iterator,
                    prefetch_to_device, split_dataset_by_year, split_dataset_random)
from ..losses.combined import station_rmse
from ..models import Generator
from ..parallel.mesh import batch_sharding, make_mesh, replicate
from ..utils.visualization import plot_stations_vs_pred, plot_training_curves
from .checkpoint import CheckpointWriter, restore_checkpoint
from .early_stopping import EarlyStopping
from .plateau import ReduceLROnPlateau
from .steps import (TrainState, make_generator_eval_step,
                    make_generator_train_step, make_optimizer)


class Trainer:
    def __init__(self, config_name: str = "default",
                 config: Optional[Config] = None):
        self.config = config if config is not None else load_config(config_name)

        self.output_dir = self.config.output.output_dir
        os.makedirs(self.output_dir, exist_ok=True)

        # training history — identical keys to reference trainer.py:27-36
        self.history = {
            "epoch": [], "total_loss": [], "point_loss": [], "conserve_loss": [],
            "smooth_loss": [], "temporal_loss": [], "rmse": [], "learning_rate": [],
        }
        self.best_rmse = float("inf")
        self.best_epoch = -1
        self.start_epoch = 0
        # async checkpoint writer: serialization overlaps the next epoch
        self._ckpt_writer = CheckpointWriter()

        self.early_stopping = None
        tc = self.config.training
        if tc.use_early_stopping:
            self.early_stopping = EarlyStopping(
                patience=tc.early_stopping_patience,
                min_delta=tc.early_stopping_min_delta, mode="min", verbose=True)
            print(f"Early stopping: enabled (patience={tc.early_stopping_patience}, "
                  f"min_delta={tc.early_stopping_min_delta})")
        else:
            print("Early stopping: disabled")

        # device mesh: data parallelism when more than one chip is visible
        self.mesh = make_mesh(self.config.mesh.data_axis,
                              self.config.mesh.axis_name)
        self.n_devices = self.mesh.devices.size
        self.data_parallel = self.n_devices > 1
        if self.data_parallel:
            print(f"Data parallelism over {self.n_devices} devices "
                  f"(mesh axis '{self.config.mesh.axis_name}')")

    # ------------------------------------------------------------------ data
    def _build_dataset(self):
        dc = self.config.data
        if dc.source == "synthetic":
            return SyntheticDownscalingDataset(
                num_days=dc.synthetic_num_sequences, T=self.config.model.T,
                lr_size=dc.synthetic_image_size,
                scale_factor=int(self.config.model.scale_factor or 8),
                num_stations=dc.synthetic_num_stations, seed=dc.seed,
                start_year=dc.start_year, end_year=dc.end_year)
        return FenheDataset(
            rain_lr_path=dc.rain_lr_path, dem_path=dc.dem_path,
            lucc_path=dc.lucc_path, rain_meta_path=dc.meta_path,
            rain_station_path=dc.rain_excel_path, shp_path=dc.shp_path,
            T=self.config.model.T, start_year=dc.start_year, end_year=dc.end_year)

    def setup_data(self):
        """Build dataset + split into train/val/test (reference trainer.py:57-129)."""
        full_dataset = self._build_dataset()
        tc = self.config.training
        if tc.use_split:
            print(f"\nSplitting dataset with method '{tc.split_method}'...")
            if tc.split_method == "year" and self.config.data.source == "fenhe":
                train_ds, val_ds, test_ds = split_dataset_by_year(
                    full_dataset, tuple(tc.train_years), tuple(tc.val_years),
                    tuple(tc.test_years))
            else:
                train_ds, val_ds, test_ds = split_dataset_random(
                    full_dataset, seed=self.config.data.split_seed)
            self.train_dataset, self.val_dataset, self.test_dataset = \
                train_ds, val_ds, test_ds
            print(f"Train: {len(train_ds)} | Val: {len(val_ds)} | "
                  f"Test: {len(test_ds)} samples\n")
        else:
            print("\nTraining on the full dataset (no split)\n")
            self.train_dataset = full_dataset
            self.val_dataset = None
            self.test_dataset = None
        return full_dataset

    def _loader(self, dataset, shuffle: bool, epoch: int = 0):
        """Batches prefetched to device (sharded over the mesh under DP).
        `data.loader: grain` routes through the grain pipeline."""
        bs = self.config.training.batch_size
        if self.data_parallel and bs % self.n_devices != 0:
            raise ValueError(f"batch_size {bs} not divisible by {self.n_devices} "
                             "devices")
        if self.config.data.loader == "grain":
            from ..data.pipeline import make_grain_loader
            it = make_grain_loader(dataset, bs, shuffle=shuffle,
                                   seed=self.config.training.seed + epoch,
                                   worker_count=self.config.data.worker_count)
        else:
            it = batch_iterator(dataset, bs, shuffle=shuffle,
                                seed=self.config.training.seed, drop_last=True,
                                epoch=epoch)
        sharding = (batch_sharding(self.mesh, self.config.mesh.axis_name)
                    if self.data_parallel else None)
        return prefetch_to_device(it, size=2, sharding=sharding)

    # ----------------------------------------------------------------- model
    def setup_model(self, dataset):
        """Model + optimizer + scheduler + loss + compiled steps
        (reference trainer.py:131-180)."""
        mc = self.config.model
        tc = self.config.training

        num_lu_classes = dataset.num_lu_classes if mc.lu_channels == 0 \
            else mc.lu_channels

        model_kwargs = dict(
            in_channels=mc.in_channels, dem_channels=mc.dem_channels,
            hidden_dims=tuple(mc.hidden_dims), lu_channels=num_lu_classes,
            kernel_size=mc.kernel_size,
            convlstm_impl=self._resolve_impl(mc.convlstm_impl),
            split_precompute=mc.split_precompute,
            dtype=jnp.bfloat16 if self.config.precision.compute_dtype == "bfloat16"
            else None)
        self.input_grid_size = None
        if mc.target_grid_size:
            model_kwargs["target_grid_size"] = tuple(mc.target_grid_size)
            self.input_grid_size = tuple(mc.input_grid_size) \
                if mc.input_grid_size else None
        elif mc.scale_factor:
            model_kwargs["scale_factor"] = mc.scale_factor

        self.model = Generator(**model_kwargs)

        # init params from one example item, batched
        sample = dataset[0]
        batch = tuple(np.stack([x]) for x in sample)
        init_kwargs = {}
        if self.input_grid_size is not None:
            init_kwargs["input_grid_size"] = self.input_grid_size
        params = self.model.init(jax.random.PRNGKey(tc.seed), *map(jnp.asarray,
                                 batch[:3]), **init_kwargs)

        self.tx = make_optimizer(tc.grad_clip_norm)
        opt_state = self.tx.init(params)
        state = TrainState(params=params, opt_state=opt_state,
                           step=jnp.zeros((), jnp.int32))
        if self.data_parallel:
            state = replicate(state, self.mesh)
        self.state = state

        self.scheduler = ReduceLROnPlateau(
            lr=tc.learning_rate, mode="min", factor=tc.scheduler_factor,
            patience=tc.scheduler_patience, verbose=True)

        self.loss_cfg = dict(
            lambda_point=tc.lambda_point, lambda_conserve=tc.lambda_conserve,
            lambda_smooth=tc.lambda_smooth, lambda_temporal=tc.lambda_temporal,
            use_weighted_loss=tc.use_weighted_loss,
            weight_strategy=tc.weight_strategy)
        print(f"Loss config: weighted={'on' if tc.use_weighted_loss else 'off'}, "
              f"strategy={tc.weight_strategy}")

        if self.data_parallel:
            from ..parallel.train_parallel import make_dp_generator_train_step
            self.train_step = make_dp_generator_train_step(
                self.model.apply, self.tx, self.loss_cfg, self.mesh,
                self.config.mesh.axis_name, self.input_grid_size)
        else:
            self.train_step = make_generator_train_step(
                self.model.apply, self.tx, self.loss_cfg, self.input_grid_size)
        self.eval_step = make_generator_eval_step(
            self.model.apply, self.loss_cfg, self.input_grid_size)

        if tc.resume_from:
            self.restore(tc.resume_from)

    def _resolve_impl(self, impl: str) -> str:
        if impl != "auto":
            return impl
        # default: XLA path everywhere; Pallas opt-in per config once it wins
        return "xla"

    # ------------------------------------------------------------------ eval
    def compute_station_rmse(self, fake_hr, s_coords, s_values, scale_factor=1.0):
        """Masked station RMSE (reference trainer.py:225-272, unified with the
        loss gather per SURVEY.md §5)."""
        return station_rmse(jnp.asarray(fake_hr), jnp.asarray(s_coords),
                            jnp.asarray(s_values), scale_factor)

    def _run_eval(self, dataset) -> Optional[Dict[str, float]]:
        """Shared eval driver: wrap-padded static-shape batches, padding masked
        inside the jit, sums aggregated exactly on host — metrics are identical
        to an unbatched computation whatever the batch size."""
        if dataset is None or len(dataset) == 0:
            return None
        from ..data.pipeline import eval_batches, put_global_batch
        from .steps import aggregate_generator_eval
        params = self.state.params
        sharding = (batch_sharding(self.mesh, self.config.mesh.axis_name)
                    if self.data_parallel else None)
        acc = []
        for batch, n_valid in eval_batches(dataset,
                                           self.config.training.batch_size):
            if sharding is not None:
                batch = put_global_batch(batch, sharding)
            acc.append(self.eval_step(params, batch,
                                      jnp.asarray(n_valid, jnp.int32)))
        return aggregate_generator_eval(acc, self.loss_cfg)

    def validate(self) -> Optional[Dict[str, float]]:
        """Validation loss + RMSE (reference trainer.py:182-223)."""
        return self._run_eval(self.val_dataset)

    def evaluate_test(self) -> Optional[Dict[str, float]]:
        """Loss + RMSE on the held-out test split — the inference/eval entry the
        reference never had (SURVEY.md §0: no torch.load, no eval CLI)."""
        return self._run_eval(self.test_dataset)

    # ----------------------------------------------------------------- train
    def train_epoch(self, epoch: int):
        """One epoch over the train loader (reference trainer.py:274-339)."""
        log_interval = self.config.output.log_interval
        epoch_metrics = []
        lr = jnp.asarray(self.scheduler.lr, jnp.float32)
        for i, batch in enumerate(self._loader(self.train_dataset, shuffle=True,
                                               epoch=epoch)):
            if i == 0 and epoch == self.start_epoch and \
                    self.config.debug.log_compiled_cost:
                from ..utils.profiling import log_compiled_cost
                log_compiled_cost("generator train step", self.train_step,
                                  self.state, batch, lr)
            self.state, metrics = self.train_step(self.state, batch, lr)
            epoch_metrics.append(metrics)
            if i % log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                print(f"Epoch {epoch} | Loss: {m['total']:.4f} | "
                      f"Point: {m['point']:.4f} | Conserve: {m['conserve']:.4f} | "
                      f"Smooth: {m['smooth']:.4f} | Temporal: {m['temporal']:.4f} | "
                      f"Batch RMSE: {m['rmse']:.4f}")
        if not epoch_metrics:
            raise ValueError(
                f"No training batches: dataset has {len(self.train_dataset)} "
                f"samples < batch_size {self.config.training.batch_size}")
        # one host sync at epoch end for the aggregates
        from .steps import aggregate_epoch_metrics
        return aggregate_epoch_metrics(epoch_metrics)

    def train(self):
        """Full training loop (reference trainer.py:341-449)."""
        dataset = self.setup_data()
        self.setup_model(dataset)

        import time
        for epoch in range(self.start_epoch, self.config.training.epochs):
            epoch_t0 = time.perf_counter()
            avg = self.train_epoch(epoch)
            epoch_s = time.perf_counter() - epoch_t0

            self.history["epoch"].append(epoch)
            self.history["total_loss"].append(avg["total"])
            self.history["point_loss"].append(avg["point"])
            self.history["conserve_loss"].append(avg["conserve"])
            self.history["smooth_loss"].append(avg["smooth"])
            self.history["temporal_loss"].append(avg["temporal"])
            self.history["rmse"].append(avg["rmse"])
            self.history["learning_rate"].append(self.scheduler.lr)

            val_metrics = self.validate()
            if val_metrics:
                print(f"Epoch {epoch} | Train RMSE: {avg['rmse']:.4f} | "
                      f"Val Loss: {val_metrics['loss']:.4f} | "
                      f"Val RMSE: {val_metrics['rmse']:.4f} | "
                      f"{epoch_s:.1f}s")
                current_rmse = val_metrics["rmse"]
            else:
                print(f"Epoch {epoch} finished. Avg Batch RMSE: {avg['rmse']:.4f}")
                current_rmse = avg["rmse"]
            # log BEFORE scheduler.step so the record carries the lr this
            # epoch actually trained at (matches history["learning_rate"])
            self._log_epoch_metrics(epoch, epoch_s, avg, val_metrics)
            self.scheduler.step(current_rmse)

            if (epoch + 1) % 10 == 0:
                from ..utils.metrics_log import is_primary_host
                if is_primary_host():  # run artifacts are owned by process 0
                    plot_training_curves(
                        self.history,
                        save_path=os.path.join(self.output_dir,
                                               "training_curves.png"),
                        dpi=self.config.output.plot_dpi)

            should_save = False
            if self.early_stopping is not None:
                if self.early_stopping(current_rmse, epoch):
                    should_save = True
                    self.best_rmse = current_rmse
                    self.best_epoch = epoch
            elif current_rmse < self.best_rmse:
                should_save = True
                self.best_rmse = current_rmse
                self.best_epoch = epoch

            if should_save:
                self.save_best(epoch, current_rmse)
                print(f"New best model saved! Epoch {epoch + 1}, "
                      f"RMSE: {current_rmse:.4f}")

            # periodic latest-checkpoint for crash recovery (the reference's
            # save_model_interval key exists but is dead code — SURVEY.md §5)
            interval = self.config.output.save_model_interval
            if interval and (epoch + 1) % interval == 0:
                self.save_latest(epoch, current_rmse)

            if self.early_stopping is not None and self.early_stopping.early_stop:
                print(f"Early stopping at epoch {epoch + 1}; best epoch "
                      f"{self.best_epoch + 1}, RMSE {self.best_rmse:.4f}")
                break

        self._ckpt_writer.wait()  # finalize any in-flight checkpoint
        from ..utils.metrics_log import dump_history, is_primary_host
        if is_primary_host():  # run artifacts are owned by process 0
            plot_training_curves(
                self.history,
                save_path=os.path.join(self.output_dir,
                                       "final_training_curves.png"),
                dpi=self.config.output.plot_dpi)
            self._final_station_plot()
        dump_history(self.output_dir, self.history)

        print("\nTraining completed!")
        print(f"Best model: Epoch {self.best_epoch + 1}, RMSE: {self.best_rmse:.4f}")
        print(f"Results saved to {self.output_dir}/")
        return self.history

    def _log_epoch_metrics(self, epoch, epoch_s, train_avg, val_metrics):
        """Append one strict-JSON line per epoch to <output_dir>/metrics.jsonl
        (process 0 only under multi-host) — machine-readable observability
        alongside the reference-parity prints (SURVEY.md §5 metrics row)."""
        from ..utils.metrics_log import append_metrics_line
        rec = {"epoch": epoch, "epoch_seconds": round(epoch_s, 3),
               "lr": self.scheduler.lr,
               **{f"train_{k}": float(v) for k, v in train_avg.items()}}
        if val_metrics:
            rec.update({f"val_{k}": float(v) for k, v in val_metrics.items()})
        append_metrics_line(self.output_dir, rec)

    def _final_station_plot(self):
        """Final obs-vs-pred scatter (reference trainer.py:434-443)."""
        try:
            ds = self.val_dataset or self.train_dataset
            batch = next(iter(self._loader(ds, shuffle=False)))
            rain_lr, dem, lu, s_coords, s_values = batch
            kwargs = {}
            if self.input_grid_size is not None:
                kwargs["input_grid_size"] = self.input_grid_size
            pred = self.model.apply(self.state.params, rain_lr, dem, lu, **kwargs)
            scale = pred.shape[-2] / rain_lr.shape[-2]
            # same scaling/bounds logic as the loss (SURVEY.md §5: unify the
            # gather the reference duplicates between loss and trainer)
            from ..losses.combined import _station_pixel_indices
            coords = np.asarray(s_coords)[0]
            h, w = pred.shape[-2:]
            rows, cols, valid = map(np.asarray, _station_pixel_indices(
                jnp.asarray(coords), scale, h, w))
            pv = np.asarray(pred)[0, :, 0][:, rows[valid], cols[valid]]
            tv = np.asarray(s_values)[0][:, valid]
            plot_stations_vs_pred(
                coords[valid], np.nan_to_num(tv).mean(0), pv.mean(0),
                save_path=os.path.join(self.output_dir,
                                       "final_station_comparison.png"),
                dpi=self.config.output.plot_dpi)
        except Exception as e:  # plotting must never kill a finished run
            print(f"Station plot skipped: {e}")

    # ------------------------------------------------------------ checkpoint
    def _host_state(self, epoch: int, rmse: float) -> Dict:
        return {
            "epoch": epoch, "rmse": rmse, "history": self.history,
            # historical best, tracked separately from this checkpoint's own
            # epoch/rmse: resuming from a periodic 'latest' checkpoint must not
            # reset the best-model bar to that epoch's (typically worse) rmse.
            "best_rmse": self.best_rmse, "best_epoch": self.best_epoch,
            "scheduler": self.scheduler.state_dict(),
            "early_stopping": (self.early_stopping.state_dict()
                               if self.early_stopping else None),
        }

    def _device_state(self):
        return {"params": self.state.params, "opt_state": self.state.opt_state,
                "step": self.state.step}

    def save_best(self, epoch: int, rmse: float):
        """Best-checkpoint bundle (reference trainer.py:402-418) + host state.
        Asynchronous: the save overlaps the next epoch's compute."""
        self._ckpt_writer.save(os.path.join(self.output_dir, "best_model"),
                               self._device_state(),
                               self._host_state(epoch, rmse))

    def save_latest(self, epoch: int, rmse: float):
        """Rolling latest-checkpoint for restart-based failure recovery."""
        self._ckpt_writer.save(os.path.join(self.output_dir, "latest"),
                               self._device_state(),
                               self._host_state(epoch, rmse))

    def restore(self, path: str):
        """Resume from a checkpoint — the load path the reference never had
        (SURVEY.md §5 checkpoint row)."""
        self._ckpt_writer.wait()  # finalize any in-flight save of this path
        target = {"params": self.state.params, "opt_state": self.state.opt_state,
                  "step": self.state.step}
        device_state, host_state = restore_checkpoint(path, target)
        self.state = TrainState(params=device_state["params"],
                                opt_state=device_state["opt_state"],
                                step=device_state["step"])
        if self.data_parallel:
            self.state = replicate(self.state, self.mesh)
        self.history = host_state["history"]
        # prefer the explicitly-tracked historical best (see _host_state); older
        # checkpoints without it fall back to the checkpoint's own epoch/rmse
        self.best_rmse = host_state.get("best_rmse", host_state["rmse"])
        self.best_epoch = host_state.get("best_epoch", host_state["epoch"])
        self.start_epoch = host_state["epoch"] + 1
        self.scheduler.load_state_dict(host_state["scheduler"])
        if self.early_stopping is not None and host_state.get("early_stopping"):
            self.early_stopping.load_state_dict(host_state["early_stopping"])
        print(f"Restored checkpoint from {path} (epoch {host_state['epoch']}, "
              f"rmse {host_state['rmse']:.4f})")
