#!/bin/bash
# Round-5 follow-up on-TPU queue: re-measure int8 PTQ serving QUALITY after
# the dynamic hidden-state scale fix (models/quantized.py — every conv input
# now quantized with a per-sample absmax scale instead of the analytic 1/127
# for hidden states). Static scales measured a real regression on converged
# checkpoints (nowcast_128 SSIM -0.098, gan_64 SSIM -0.190 — design.md);
# this queue records whether dynamic scales recover it, plus the latency
# shift the extra VPU absmaxes cost (int8 stays a latency NEGATIVE either
# way — this is a quality-axis measurement).
#
# Run ONLY after tpu_revalidate_r5.sh has fully exited (sequential TPU use),
# box otherwise QUIET:
#
#   bash experiments/tpu_revalidate_r5b.sh 2>&1 | tee /tmp/tpu_revalidate_r5b.log
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"

echo "=== probe ==="
timeout 150 python -c "import jax; print(jax.devices())" || {
  echo "tunnel down — aborting"; exit 1; }

echo "=== 1) int8 quality, dynamic hidden scales: trained nowcast_128 ckpt ==="
# static-scale record (r4 step 9b): f32 L1 0.0974/SSIM 0.616 -> int8 L1
# 0.1047/SSIM 0.517. PASS bar: int8 SSIM within 0.01 of f32.
timeout 1800 python experiments/int8_quality.py --config nowcast_128

echo "=== 2) int8 quality, dynamic hidden scales: trained gan_64 ckpt ==="
# static-scale record (r4 step 10b): f32 L1 0.0948/SSIM 0.600 -> int8 L1
# 0.1002/SSIM 0.410.
timeout 1800 python experiments/int8_quality.py --config gan_64

echo "=== 3) int8 latency with dynamic scales (bench shape, 2-cell) ==="
# keep design.md's 'int8 scan' row honest: the per-conv absmaxes change the
# program. Static-scale record: 26.05 ms at this shape (vs 15.46 XLA bf16).
timeout 3600 python experiments/rollout_kernel_bench.py

echo "=== r5b queue done ==="
