"""Console entry point — mirrors the reference CLI (``/root/reference/main.py:11-24``):
``pl-convlstm-gan-tpu --config <name>`` (or ``python main.py --config <name>`` from a
checkout) builds a trainer, validates the config, trains.

The config's ``model.family`` selects the trainer: "generator" (downscaling parity
path) uses ``Trainer``; "forecaster"/"gan" (north-star sequence-prediction families)
use ``SequenceTrainer``. Extra modes the reference lacks: eval / predict / export,
plus ``--resume`` crash recovery."""
import argparse
import os


def _require_reachable_backend(timeout_s: float = 240.0) -> None:
    """Fail FAST with an actionable message when the accelerator backend
    cannot come up. With the TPU tunnel down, the first in-process backend
    touch blocks forever in a silent connect-retry loop — a user launching a
    training run deserves an error, not an unexplained hang. Probes in a
    killable subprocess (``utils.profiling.probe_backend``); skipped when the
    backend touch is hang-safe (CPU primary — tests, local runs), when
    ``PLCG_NO_BACKEND_PROBE=1`` (wait for the backend indefinitely, the
    pre-probe behavior), or on a MULTI-HOST launch: a standalone probe child
    on one host of a pod slice blocks waiting for the other workers, so on
    healthy hardware the probe itself would time out and brick the launch.
    Bounded, not absolute: a tunnel that dies within the probe marker's TTL
    of a prior success (see probe_backend) can still hang backend init."""
    from pl_convlstm_gan_tpu.utils.profiling import (backend_touch_is_hang_safe,
                                                     probe_backend)
    if os.environ.get("PLCG_NO_BACKEND_PROBE") == "1":
        return
    if os.environ.get("COORDINATOR_ADDRESS"):
        return   # multi-host (parallel/mesh.py maybe_init_distributed)
    if backend_touch_is_hang_safe():
        return
    if not probe_backend(timeout_s):
        raise SystemExit(
            "accelerator backend unreachable (TPU tunnel down?). Fix the "
            "device connection, run on CPU with JAX_PLATFORMS=cpu (also "
            "unset PALLAS_AXON_POOL_IPS if set), or set "
            "PLCG_NO_BACKEND_PROBE=1 to wait for the backend indefinitely.")


def main():
    # persistent XLA compile cache — must run before the backend is touched
    from pl_convlstm_gan_tpu.utils.profiling import setup_compile_cache
    setup_compile_cache()
    _require_reachable_backend()
    from pl_convlstm_gan_tpu.config import load_config
    from pl_convlstm_gan_tpu.train.trainer import Trainer
    from pl_convlstm_gan_tpu.train.sequence_trainer import SequenceTrainer

    parser = argparse.ArgumentParser(description="pl-convlstm-gan-tpu training")
    parser.add_argument("--config", type=str, default="default",
                        help="Configuration name (configs/<name>.yaml) or a "
                             "direct path to a .yaml file")
    parser.add_argument("--mode",
                        choices=("train", "eval", "predict", "export",
                                 "export-stream", "stream"),
                        default="train",
                        help="train; eval: restore a checkpoint and report "
                             "test-split metrics; predict: restore and write "
                             "model outputs for an input .npy; export: AOT "
                             "serving artifact (StableHLO, batch-polymorphic, "
                             "TPU+CPU) from a checkpoint; export-stream: the "
                             "stateful streaming-inference surface (observe + "
                             "forecast programs) as one artifact; stream: run "
                             "stateful inference over an input frame series — "
                             "assimilate frame-by-frame, write per-frame "
                             "nowcasts + horizon forecasts "
                             "(entries the reference lacks)")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="checkpoint dir for --mode eval/predict "
                             "(default: <output_dir>/best_model)")
    parser.add_argument("--input", type=str, default=None,
                        help="predict mode: input .npy — frames "
                             "[B,T_in,C,H,W] for forecaster/gan; for the "
                             "generator, an .npz with rain_lr/dem/lu arrays")
    parser.add_argument("--output", type=str, default=None,
                        help="predict mode: output .npy path "
                             "(default: <output_dir>/predictions.npy)")
    parser.add_argument("--output-frames", type=int, default=0,
                        help="predict/export/export-stream mode, sequence "
                             "families: serve a different rollout horizon "
                             "than the checkpoint was trained at (recurrent "
                             "params are horizon-independent); for "
                             "export-stream this picks the exported forecast "
                             "program's horizon; 0 = config value")
    parser.add_argument("--horizons", type=str, default="",
                        help="export-stream mode: comma-separated forecast "
                             "horizons to export (e.g. '10,30,60' -> one "
                             "forecast program per horizon in the artifact); "
                             "stream mode: horizons to forecast after "
                             "assimilating the input series; "
                             "overrides --output-frames")
    parser.add_argument("--tpu-kernel", type=str, default="auto",
                        choices=("auto", "require", "off"),
                        help="export-stream mode: embed TPU-only Pallas "
                             "rollout programs in the artifact for supported "
                             "horizons (auto), fail if none fit (require), "
                             "or export XLA-only (off)")
    parser.add_argument("--resume", action="store_true",
                        help="train mode: resume from <output_dir>/latest "
                             "(or best_model) if present — restart-based "
                             "crash recovery")
    args = parser.parse_args()
    if args.output_frames < 0:
        raise SystemExit("--output-frames must be non-negative "
                         "(0 = config value)")

    config = load_config(args.config)
    config.validate()
    config.apply_debug_flags()

    # multi-host bootstrap (no-op on single-host; SURVEY.md §2.2). Must run
    # BEFORE anything touches the jax backend (e.g. recover_checkpoint_dir):
    # jax.distributed.initialize raises once the backend is up, and the resume
    # recovery below relies on process_index gating + barriers so that exactly
    # one host mutates the shared checkpoint directories.
    from pl_convlstm_gan_tpu.parallel.mesh import maybe_init_distributed
    maybe_init_distributed()

    if args.resume and not config.training.resume_from:
        from pl_convlstm_gan_tpu.train.checkpoint import recover_checkpoint_dir
        for name in ("latest", "best_model"):
            ckpt = os.path.join(config.output.output_dir, name)
            # also recovers a checkpoint stranded at <ckpt>.old (crash
            # mid-promotion) or fully serialized at <ckpt>.pending (crash
            # after serialization, before promotion)
            if recover_checkpoint_dir(ckpt):
                config.training.resume_from = ckpt
                print(f"Resuming from {ckpt}")
                break
        else:
            print("--resume: no checkpoint found, starting fresh")

    # predict (and export-with-input) never use the trainer — don't spin up
    # its device mesh / async checkpoint writer / early-stopping banner for an
    # inference-only invocation
    def make_trainer():
        if config.model.family in ("forecaster", "gan"):
            return SequenceTrainer(config=config)
        return Trainer(config=config)

    def parse_horizons():
        """--horizons, falling back to --output-frames / the config horizon."""
        if args.horizons:
            try:
                return tuple(int(h) for h in args.horizons.split(","))
            except ValueError:
                raise SystemExit(f"--horizons must be comma-separated ints, "
                                 f"got {args.horizons!r}")
        return (args.output_frames or config.model.output_frames,)

    def load_frames(path):
        """Frames array from a .npy, or a .npz with a 'frames' key."""
        import numpy as np
        data = np.load(path)
        return (data["frames"]
                if isinstance(data, np.lib.npyio.NpzFile) else data)

    if args.mode == "eval":
        trainer = make_trainer()
        ckpt = args.checkpoint or os.path.join(config.output.output_dir,
                                               "best_model")
        ds = trainer.setup_data()
        trainer.setup_model(ds)
        trainer.restore(ckpt)
        metrics = trainer.evaluate_test()
        print(f"Test metrics: {metrics}")
    elif args.mode == "predict":
        import numpy as np
        from pl_convlstm_gan_tpu.predict import load_predictor
        if not args.input:
            raise SystemExit("--mode predict requires --input")
        ckpt = args.checkpoint or os.path.join(config.output.output_dir,
                                               "best_model")
        out_path = args.output or os.path.join(config.output.output_dir,
                                               "predictions.npy")
        # dispatch on the model family (not the file extension): forecaster/gan
        # take a frames array (.npy, or .npz with a 'frames' key); the
        # generator takes an .npz with rain_lr/dem/lu arrays.
        data = np.load(args.input)
        is_npz = isinstance(data, np.lib.npyio.NpzFile)
        if config.model.family in ("forecaster", "gan"):
            frames = data["frames"] if is_npz else data
            predict = load_predictor(config, ckpt,
                                     output_frames=args.output_frames)
            pred = predict(frames)
        else:
            if not is_npz:
                raise SystemExit("generator-family predict needs an .npz with "
                                 "rain_lr/dem/lu arrays")
            predict = load_predictor(config, ckpt,
                                     lu_channels=data["lu"].shape[1])
            pred = predict(data["rain_lr"], data["dem"], data["lu"])
        np.save(out_path, np.asarray(pred))
        print(f"Predictions {np.asarray(pred).shape} saved to {out_path}")
    elif args.mode == "export":
        import numpy as np
        from pl_convlstm_gan_tpu.serve import export_model
        ckpt = args.checkpoint or os.path.join(config.output.output_dir,
                                               "best_model")
        out_path = args.output or os.path.join(config.output.output_dir,
                                               "model.jaxexport")
        lu_channels = 0
        if config.model.family in ("forecaster", "gan"):
            if args.input:  # sample input fixes the non-batch shapes
                example = (load_frames(args.input)[:1],)
            else:
                # derive the static T/C/H/W from the configured dataset itself
                # (works for synthetic AND on-disk frames sources — a
                # synthetic_image_size guess would bake wrong H/W into the
                # artifact for frames-trained checkpoints)
                ds = make_trainer().setup_data()
                example = (np.asarray(ds[0][0])[None],)
        else:
            if not args.input:
                raise SystemExit("generator-family export needs --input: an "
                                 ".npz with rain_lr/dem/lu sample arrays")
            data = np.load(args.input)
            if not isinstance(data, np.lib.npyio.NpzFile):
                raise SystemExit("generator-family export needs an .npz with "
                                 "rain_lr/dem/lu arrays (got a plain .npy)")
            example = (data["rain_lr"][:1], data["dem"][:1], data["lu"][:1])
            lu_channels = data["lu"].shape[1]
        blob = export_model(config, ckpt, example, lu_channels=lu_channels,
                            output_frames=args.output_frames)
        with open(out_path, "wb") as f:
            f.write(blob)
        print(f"Exported serving artifact ({len(blob)} bytes, "
              f"batch-polymorphic, tpu+cpu) to {out_path}")
    elif args.mode == "export-stream":
        import numpy as np
        from pl_convlstm_gan_tpu.serve import export_streaming
        if config.model.family not in ("forecaster", "gan"):
            raise SystemExit("streaming export needs a sequence family "
                             "(forecaster/gan)")
        ckpt = args.checkpoint or os.path.join(config.output.output_dir,
                                               "best_model")
        out_path = args.output or os.path.join(config.output.output_dir,
                                               "stream.jaxexport")
        if args.input:  # sample fixes the static H/W
            hgt, wid = load_frames(args.input).shape[-2:]
        else:
            ds = make_trainer().setup_data()
            hgt, wid = np.asarray(ds[0][0]).shape[-2:]
        horizons = parse_horizons()
        blob = export_streaming(config, ckpt, int(hgt), int(wid),
                                horizons=horizons,
                                tpu_kernel=args.tpu_kernel)
        with open(out_path, "wb") as f:
            f.write(blob)
        from pl_convlstm_gan_tpu.serve import parse_stream_header
        pallas_hs = parse_stream_header(blob)[0].get("pallas_horizons", [])
        print(f"Exported streaming artifact ({len(blob)} bytes, observe + "
              f"forecast{list(horizons)}, pallas{pallas_hs}, "
              f"batch-polymorphic, tpu+cpu) to {out_path}")
    elif args.mode == "stream":
        import numpy as np
        if config.model.family not in ("forecaster", "gan"):
            raise SystemExit("stream mode needs a sequence family "
                             "(forecaster/gan)")
        if not args.input:
            raise SystemExit("--mode stream requires --input: frames "
                             "[T,C,H,W] (one stream) or [B,T,C,H,W] "
                             "(B concurrent streams)")
        frames = np.asarray(load_frames(args.input), np.float32)
        if frames.ndim == 4:
            frames = frames[None]
        if frames.ndim != 5:
            raise SystemExit(f"stream input must be [T,C,H,W] or "
                             f"[B,T,C,H,W], got shape {frames.shape}")
        b, t, chans, hgt, wid = frames.shape
        horizons = parse_horizons()
        ckpt = args.checkpoint or os.path.join(config.output.output_dir,
                                               "best_model")
        out_path = args.output or os.path.join(config.output.output_dir,
                                               "stream_out.npz")
        # a .jaxexport checkpoint runs the AOT streaming artifact (no model
        # code — the serving-process path); a checkpoint dir runs the live
        # StreamingForecaster (which auto-selects the TPU rollout kernel)
        if ckpt.endswith(".jaxexport"):
            from pl_convlstm_gan_tpu.serve import load_streaming_exported
            with open(ckpt, "rb") as f:
                server = load_streaming_exported(f.read())
            missing = [h for h in horizons if h not in server.horizons]
            if missing:
                raise SystemExit(
                    f"artifact only has forecast programs for horizons "
                    f"{list(server.horizons)} — missing {missing} "
                    f"(re-export with --horizons)")
            want = tuple(server._meta[k]
                         for k in ("channels", "height", "width"))
            if (chans, hgt, wid) != want:
                raise SystemExit(
                    f"input frames are C,H,W={chans, hgt, wid} but the "
                    f"artifact was exported at {want}")
            state = server.init_state(b)
            observe, forecast = server.observe, server.forecast
        else:
            from pl_convlstm_gan_tpu.streaming import StreamingForecaster
            sf = StreamingForecaster.from_checkpoint(config, ckpt)
            state = sf.init_state(b, int(hgt), int(wid))
            observe, forecast = sf.observe, sf.forecast
        # keep results on device inside the loop — a per-frame host fetch
        # would serialize dispatch (26 ms/call through the TPU tunnel)
        nowcasts = []
        for i in range(t):
            state, nc = observe(state, frames[:, i])
            nowcasts.append(nc)
        out = {"nowcasts": np.stack([np.asarray(n) for n in nowcasts],
                                    axis=1)}
        for h in horizons:
            out[f"forecast_{h}"] = np.asarray(forecast(state, h))
        np.savez(out_path, **out)
        shapes = {k: v.shape for k, v in out.items()}
        print(f"Streamed {t} frames x {b} stream(s): {shapes} "
              f"saved to {out_path}")
    else:
        make_trainer().train()


if __name__ == "__main__":
    main()
