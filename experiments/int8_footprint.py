"""int8 PTQ footprint: the numbers that decide when `rollout_impl: int8` is
worth choosing now that the latency answer is a measured NEGATIVE (v5e
2026-08-19: int8 scan 1.65x SLOWER than the bf16 XLA scan — XLA does not
lower our 3x3 convs to the s8 MXU path; docs/design.md).

What this measures, per serving family:
- params bytes at rest (f32 checkpoint tree vs the int8-prepared tree —
  conv kernels as s8 + per-channel scales, biases/head f32). This is also
  the device-HBM-at-rest delta: the served weight tree is exactly these
  arrays device_put verbatim.
- serialized `jax.export` artifact bytes (serve.export_model): float vs
  quantized blob at the same symbolic-batch serving shapes. Weights travel
  INSIDE the artifact, so this is the deployment-transfer size.

Runs fine on CPU (export = trace + lower, no device compute; sizes are
platform-independent). Prefer:
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python experiments/int8_footprint.py
Prints one JSON line per family plus a summary table.
"""
import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def tree_bytes(tree) -> int:
    import jax
    import numpy as np
    return int(sum(np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(tree)))


def measure_family(name: str, hidden_dims, t_in: int, t_out: int,
                   size: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pl_convlstm_gan_tpu.config import Config
    from pl_convlstm_gan_tpu.models import ConvLSTMForecaster
    from pl_convlstm_gan_tpu.models.quantized import prepare_int8_forecaster
    from pl_convlstm_gan_tpu.serve import export_model
    from pl_convlstm_gan_tpu.train.checkpoint import save_checkpoint

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.random((1, t_in, 1, size, size), np.float32))
    model = ConvLSTMForecaster(hidden_dims=tuple(hidden_dims),
                               input_frames=t_in, output_frames=t_out,
                               dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), frames)
    qtree = prepare_int8_forecaster(params)

    row = {"family": name, "hidden_dims": list(hidden_dims),
           "t_in": t_in, "t_out": t_out, "size": size,
           "params_bytes_f32": tree_bytes(params),
           "params_bytes_int8": tree_bytes(qtree)}
    row["params_ratio"] = round(
        row["params_bytes_f32"] / row["params_bytes_int8"], 2)

    # artifact bytes: same checkpoint exported float (bf16-compute XLA scan)
    # vs quantized; symbolic batch, default TPU+CPU platforms
    with tempfile.TemporaryDirectory() as tmp:
        ckpt = os.path.join(tmp, "ckpt")
        save_checkpoint(ckpt, {"params": params}, {})
        base = {"data": {"source": "synthetic"},
                "model": {"family": "forecaster",
                          "hidden_dims": list(hidden_dims),
                          "input_frames": t_in, "output_frames": t_out},
                "training": {"batch_size": 4, "epochs": 1},
                "precision": {"compute_dtype": "bfloat16"},
                "output": {"output_dir": tmp}}
        cfg_f = Config.from_dict(base)
        blob_f = export_model(cfg_f, ckpt, (np.asarray(frames),))
        qbase = {**base, "model": {**base["model"], "rollout_impl": "int8"}}
        cfg_q = Config.from_dict(qbase)
        blob_q = export_model(cfg_q, ckpt, (np.asarray(frames),))
    row["artifact_bytes_float"] = len(blob_f)
    row["artifact_bytes_int8"] = len(blob_q)
    row["artifact_ratio"] = round(len(blob_f) / len(blob_q), 2)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="only the flagship family")
    args = ap.parse_args()

    fams = [("nowcast_128 (flagship)", (64, 64, 64), 5, 20, 128)]
    if not args.quick:
        fams += [("bench / gan_64", (64, 64), 5, 10, 128),
                 ("gan_256 serving", (64, 64), 5, 30, 256)]

    rows = [measure_family(*f) for f in fams]
    for r in rows:
        print(json.dumps(r), flush=True)
    print(f"\n{'family':<24} {'params f32':>12} {'params int8':>12} "
          f"{'ratio':>6} {'artifact f':>12} {'artifact q':>12} {'ratio':>6}")
    for r in rows:
        print(f"{r['family']:<24} {r['params_bytes_f32']:>12,} "
              f"{r['params_bytes_int8']:>12,} {r['params_ratio']:>6} "
              f"{r['artifact_bytes_float']:>12,} "
              f"{r['artifact_bytes_int8']:>12,} {r['artifact_ratio']:>6}")


if __name__ == "__main__":
    main()
