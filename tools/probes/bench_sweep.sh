#!/bin/bash
# Bench config sweep (VERDICT r3 #7): scenario batch x Newton-Schulz
# budget, each as one bench.py worker run (fetch-synced, compile included
# in the first eval only). The stage_residual_max field in each line is
# the solve-quality guard that justifies the chosen budget.
#
# HBM note: the hoisted stage tensors need 3*nsteps*(2N)^2*4B*scenarios
# = 6.3 GB at S=32, 12.6 GB at S=64 (v5e has 16 GB) - S=128 cannot hoist
# and is not swept.
#
# Usage: bash tools/probes/bench_sweep.sh > results/diag/bench_sweep.log 2>&1
cd "$(dirname "$0")/../.."
for S in 32 64; do
  for ITERS in 56 52 48; do
    echo "=== scenarios=$S schulz_iters=$ITERS ==="
    QGD_BENCH_SCENARIOS=$S QGD_BENCH_SCHULZ_ITERS=$ITERS \
      QGD_HOIST_CAP_BYTES=14000000000 \
      timeout 1500 python -u bench.py --worker
    echo "=== exit=$? ==="
  done
done
