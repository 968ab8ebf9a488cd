"""Does the discriminator earn its lambda? (round-3 VERDICT item 2)

Ablates lambda_adv in {0, 0.001, 0.01} on the gan_64 recipe (benchmark config
#2 shapes) with a FIXED seed and split, and reports held-out test L1 / SSIM
**plus** the sharpness metrics adversarial training is supposed to move
(losses/sharpness.py): high-frequency spectral power ratio and gradient-
magnitude ratio vs ground truth. lambda_adv=0 still trains the discriminator
(so D-health is comparable) but G receives no adversarial gradient — i.e. it
degenerates to the forecaster + L1 objective with identical architecture,
optimizer, and scheduled-sampling draws.

Run: python experiments/lambda_adv_ablation.py [--epochs N] [--lambdas ...]
Writes results to experiments/lambda_adv_ablation.json and prints a table.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pl_convlstm_gan_tpu.utils.profiling import setup_compile_cache

setup_compile_cache()

from pl_convlstm_gan_tpu.config import Config


def run_one(lambda_adv: float, epochs: int, out_root: str) -> dict:
    from pl_convlstm_gan_tpu.train.sequence_trainer import SequenceTrainer

    cfg = Config.from_dict({
        "data": {"source": "synthetic", "synthetic_num_sequences": 256,
                 "synthetic_image_size": 64, "seed": 0, "split_seed": 42},
        "model": {"family": "gan", "hidden_dims": [64, 64],
                  "input_frames": 5, "output_frames": 10, "in_channels": 1,
                  "disc_features": [64, 128, 256]},
        "training": {"batch_size": 8, "epochs": epochs,
                     "learning_rate": 0.0002, "disc_learning_rate": 0.0002,
                     "lambda_adv": lambda_adv, "lambda_l1": 1.0,
                     "grad_clip_norm": 0.5, "use_early_stopping": False,
                     "use_split": True, "split_method": "random", "seed": 0,
                     "scheduled_sampling": True, "sampling_decay_epochs": 40,
                     "eval_sharpness": True},
        "precision": {"compute_dtype": "bfloat16"},
        "output": {"output_dir": os.path.join(out_root,
                                              f"adv_{lambda_adv:g}"),
                   "log_interval": 50},
    })
    cfg.validate()
    t0 = time.perf_counter()
    tr = SequenceTrainer(config=cfg)
    tr.train()
    # capture BEFORE restore: restoring best_model overwrites tr.history with
    # the best-epoch snapshot, which would silently relabel the value
    d_final = tr.history["d_loss"][-1] if tr.history.get("d_loss") else None
    # evaluate the BEST checkpoint (not the last epoch) on the held-out split
    tr.restore(os.path.join(cfg.output.output_dir, "best_model"))
    d_best = tr.history["d_loss"][-1] if tr.history.get("d_loss") else None
    test = tr.evaluate_test()
    return {"lambda_adv": lambda_adv, "epochs": epochs,
            "wall_s": round(time.perf_counter() - t0, 1),
            "best_epoch": tr.best_epoch, "d_loss_final": d_final,
            "d_loss_at_best": d_best,
            **{f"test_{k}": v for k, v in test.items()}}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--lambdas", type=float, nargs="+",
                   default=[0.0, 0.001, 0.01])
    p.add_argument("--out", default="/tmp/lambda_adv_ablation")
    args = p.parse_args()

    results = []
    for lam in args.lambdas:
        print(f"\n=== lambda_adv = {lam:g} ===", flush=True)
        res = run_one(lam, args.epochs, args.out)
        results.append(res)
        print(json.dumps(res), flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "lambda_adv_ablation.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)

    cols = ["lambda_adv", "test_l1", "test_ssim", "test_sharp_hf_ratio",
            "test_sharp_gm_ratio", "d_loss_at_best", "best_epoch"]
    print("\n| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for r in results:
        print("| " + " | ".join(
            f"{r.get(c):.4g}" if isinstance(r.get(c), float) else str(r.get(c))
            for c in cols) + " |")
    print(f"\nresults saved to {path}")


if __name__ == "__main__":
    main()
