#!/bin/bash
# Round-5 on-TPU queue. Run ONLY after tpu_revalidate_r4.sh has fully exited
# (sequential TPU use — concurrent compiles contend through the tunnel), and
# keep the box otherwise QUIET: r4 steps 5/6 each died at their 3600 s
# timeout because a concurrent pytest contended the 1-core host during the
# 256px cold Mosaic compiles.
#
#   bash experiments/tpu_revalidate_r5.sh 2>&1 | tee /tmp/tpu_revalidate_r5.log
#
# Steps:
#   1. 256x256 streamed warm streaming (r4 step 5 re-run, quiet + 2h budget)
#      -> if green + win vs the XLA line the same run prints, flip
#      _MOSAIC_VALIDATED_STREAMED in ops/pallas/rollout_kernel.py
#   2. cold 256x256 5->30 resident vs streamed A/B (r4 step 6 re-run) —
#      verifies `auto` preferring resident-where-both-fit on hardware
#   3. gan256 roofline + levers (round-4 VERDICT item 6): cost-model
#      attribution of the 242 ms GAN step, remat variants, and the
#      one-forward vjp restructure (modeled 0.78x flops on the smoke shape)
#   4. headline bench refresh — first TPU run of the fixed bench.py
#      (int8 row now forwarded; skipped rows visible as skipped_*)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"

echo "=== probe ==="
timeout 150 python -c "import jax; print(jax.devices())" || {
  echo "tunnel down — aborting"; exit 1; }

echo "=== 0) exported-artifact embedded kernel execution (r4 step 8 re-run) ==="
# r4's run died on a stale import (build_model moved to predict) — fixed;
# this is the one serving path with only CPU-lowering evidence
timeout 3600 python experiments/artifact_latency.py

echo "=== 1) streamed warm streaming @ 256x256 (re-run, quiet) ==="
timeout 7200 python experiments/streaming_latency.py --size 256 \
    --io-mode streamed

echo "=== 2) cold 256x256 5->30: resident vs streamed (re-run, quiet) ==="
timeout 7200 python experiments/rollout_kernel_bench.py --size 256 \
    --t-out 30 --batch 1 --io-mode resident
timeout 7200 python experiments/rollout_kernel_bench.py --size 256 \
    --t-out 30 --batch 1 --io-mode streamed

echo "=== 3) gan256 roofline attribution + levers ==="
timeout 7200 python experiments/gan256_roofline.py

echo "=== 4) headline bench refresh (fixed skip-row reporting) ==="
timeout 3600 python bench.py

echo "=== r5 queue done ==="
