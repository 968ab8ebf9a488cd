#!/bin/bash
# One-shot on-TPU validation queue for the pending kernel items (run when the
# axon tunnel is back up). Sequential on purpose — concurrent TPU compiles
# contend through the tunnel. Supersedes tpu_revalidate_r3.sh (its three
# steps are 1-3 here).
#
#   bash experiments/tpu_revalidate_r4.sh 2>&1 | tee /tmp/tpu_revalidate_r4.log
#
# Steps:
#   1. 3-cell rollout kernel cold compile + bench (round-3 pending: the
#      Mosaic lowering that never compiled on hardware; client-side lowering
#      pinned green) -> if green + win, flip _MOSAIC_VALIDATED_CELLS to (2,3)
#   2. 3-cell warm/streaming latency
#   3. headline bench refresh (captures the mfu/roofline/serving fields the
#      round-3 outage lost)
#   4. streamed-I/O kernel variant (round 4) at the bench shape, cold A/B vs
#      resident — first server-side Mosaic compile of the DMA descriptors
#   5. streamed warm streaming at 256x256 h=30 — THE shape this variant
#      exists for (resident budget can't fit it); compare vs the XLA scan
#      line printed by the same run -> if green + win, flip
#      _MOSAIC_VALIDATED_STREAMED to True in ops/pallas/rollout_kernel.py
#   6. cold 256x256 5->30: resident vs streamed A/B (both fit; auto picks
#      resident — verify that's right on hardware)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"

echo "=== probe ==="
timeout 150 python -c "import jax; print(jax.devices())" || {
  echo "tunnel down — aborting"; exit 1; }

echo "=== 1) rollout kernel bench, 3 cells (cold Mosaic compile) ==="
timeout 3600 python experiments/rollout_kernel_bench.py --cells 3

echo "=== 2) streaming latency, 3 cells (warm path) ==="
timeout 1800 python experiments/streaming_latency.py --cells 3

echo "=== 3) headline bench refresh ==="
timeout 3600 python bench.py

echo "=== 4) streamed-I/O variant, bench shape (cold A/B vs resident) ==="
timeout 3600 python experiments/rollout_kernel_bench.py --io-mode streamed

echo "=== 5) streamed warm streaming @ 256x256 (the target shape) ==="
timeout 3600 python experiments/streaming_latency.py --size 256 \
    --io-mode streamed

echo "=== 6) cold 256x256 5->30: resident vs streamed ==="
timeout 3600 python experiments/rollout_kernel_bench.py --size 256 \
    --t-out 30 --batch 1 --io-mode resident
timeout 3600 python experiments/rollout_kernel_bench.py --size 256 \
    --t-out 30 --batch 1 --io-mode streamed

echo "=== 7) multi-stream scaling sweep (B 1/2/4/8) ==="
timeout 3600 python experiments/streaming_latency.py --batch-sweep

echo "=== 8) exported-artifact embedded kernel program execution ==="
# export_streaming -> serialize -> load_streaming_exported -> run the
# EMBEDDED Mosaic kernel program on-device (round-3 VERDICT item 1's last
# sub-item: this path had only CPU lowering evidence)
timeout 3600 python experiments/artifact_latency.py

echo "=== 9) convergence regression: nowcast_128 recipe on the final tree ==="
# recorded reference (docs/design.md): best-epoch val L1 0.0959 / SSIM 0.61,
# held-out test L1 0.0995 / SSIM 0.599 (~12 min wall on v5e-1)
timeout 3600 python main.py --config nowcast_128
timeout 1200 python main.py --config nowcast_128 --mode eval

echo "=== 9b) int8 PTQ serving: quality on the trained nowcast_128 ckpt ==="
# f32 vs int8 test-set L1/SSIM through the same eval pipeline; latency A/B
# already rides along in steps 1/4/6 (rollout_kernel_bench prints an
# 'int8 scan' row). CPU smoke on a tiny ckpt measured +0.01% L1.
timeout 1800 python experiments/int8_quality.py --config nowcast_128

echo "=== 10) convergence regression: gan_64 recipe on the final tree ==="
# recorded reference (docs/design.md lambda ablation, lambda_adv=0.001 row):
# test L1 0.1051 / SSIM 0.537 (~9 min wall on v5e-1)
timeout 3600 python main.py --config gan_64
timeout 1200 python main.py --config gan_64 --mode eval

echo "=== 10b) int8 PTQ serving: quality on the trained gan_64 ckpt ==="
timeout 1800 python experiments/int8_quality.py --config gan_64

echo "=== all done ==="
