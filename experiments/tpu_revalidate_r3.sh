#!/bin/bash
# One-shot on-TPU validation queue for the round-3 pending items (run when the
# axon tunnel is back up; see CLAUDE.md "PENDING on-TPU"). Sequential on
# purpose — concurrent TPU compiles contend through the tunnel.
#
#   bash experiments/tpu_revalidate_r3.sh 2>&1 | tee /tmp/tpu_revalidate_r3.log
#
# Steps:
#   1. 3-cell rollout kernel cold compile + bench (the Mosaic lowering that
#      never compiled on hardware; client-side lowering already pinned green)
#   2. 3-cell warm/streaming latency
#   3. headline bench refresh (rollout kernel + round-3 serving path included)
# After a green 1+2 with a win, flip _MOSAIC_VALIDATED_CELLS to (2, 3) in
# ops/pallas/rollout_kernel.py and update docs/design.md + PARITY.md.
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

echo "=== all done ==="
