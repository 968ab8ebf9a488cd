"""int8 PTQ serving quality on a TRAINED checkpoint: test-set L1/SSIM of the
quantized rollout vs the f32 scan, through the trainer's own eval pipeline
(identical batching, wrap-pad masking, and exact host aggregation — the two
rows differ ONLY in the rollout that produced the predictions).

Usage (after a training run has produced <output_dir>/best_model):

    python experiments/int8_quality.py --config nowcast_128

Quantization error on random weights is ~2.5% relative (tests/test_quant.py);
this is the measurement that turns that into deployment terms: how much
test-set L1/SSIM does int8 serving actually cost for a given checkpoint?
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pl_convlstm_gan_tpu.utils.profiling import setup_compile_cache

setup_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="nowcast_128")
    ap.add_argument("--checkpoint", default="",
                    help="defaults to <output_dir>/best_model")
    args = ap.parse_args()

    from pl_convlstm_gan_tpu.config import load_config
    from pl_convlstm_gan_tpu.models.quantized import (prepare_int8_forecaster,
                                                      rollout_int8)
    from pl_convlstm_gan_tpu.train import SequenceTrainer
    from pl_convlstm_gan_tpu.train.steps import make_forecaster_eval_step

    config = load_config(args.config)
    if config.model.family not in ("forecaster", "gan"):
        raise SystemExit("int8 serving targets the sequence families")
    ckpt = args.checkpoint or os.path.join(config.output.output_dir,
                                           "best_model")
    trainer = SequenceTrainer(config=config)
    ds = trainer.setup_data()
    trainer.setup_model(ds)
    trainer.restore(ckpt)

    base = trainer.evaluate_test()
    print(f"f32  rollout: {base}", flush=True)

    # same eval step factory, int8 rollout as the apply_fn — quantization is
    # traced into the program (weights enter as jit args, not constants)
    t_out = config.model.output_frames
    tc = config.training
    thresholds = tuple(tc.eval_thresholds) if tc.eval_thresholds else None
    trainer.eval_step = make_forecaster_eval_step(
        lambda p, inputs: rollout_int8(prepare_int8_forecaster(p), inputs,
                                       t_out),
        thresholds, sharpness=tc.eval_sharpness)
    quant = trainer.evaluate_test()
    print(f"int8 rollout: {quant}", flush=True)
    dl1 = quant["l1"] - base["l1"]
    dssim = quant["ssim"] - base["ssim"]
    print(f"delta: L1 {dl1:+.5f} ({100 * dl1 / max(base['l1'], 1e-9):+.2f}%) "
          f"| SSIM {dssim:+.5f}", flush=True)


if __name__ == "__main__":
    main()
