#!/bin/bash
# Round-4 perf pass (VERDICT items 4 & 6): wide-m rooflines with the shared
# analytic FLOP model, a split-leaf tuning attempt measured against them,
# the seismic-shape ablation, the --sparse path comparison, and a final
# on-chip bench.py capture.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export GPRF_EXPERIMENTS="${GPRF_EXPERIMENTS:-$HOME/gprf_experiments}"
cd /root/repo

echo "=== ablate_wide, split engaged (default leaf 96) ($(date +%H:%M:%S))"
timeout 3000 python scripts/ablate_wide.py default lossonly unary
echo "=== ablate_wide, XLA panels (GPRF_SPLIT_MAX_M=0 A/B)"
GPRF_SPLIT_MAX_M=0 timeout 3000 python scripts/ablate_wide.py default
echo "=== ablate_wide, leaf=128 attempt"
GPRF_SPLIT_LEAF=128 timeout 3000 python scripts/ablate_wide.py default
echo "=== ablate_wide, leaf=168 attempt"
GPRF_SPLIT_LEAF=168 timeout 3000 python scripts/ablate_wide.py default
echo "=== ablate_seismic ($(date +%H:%M:%S))"
timeout 3000 python scripts/ablate_seismic.py default gradeval lossonly reblock
echo "=== bench_sparse dense+fused"
timeout 3000 python scripts/bench_sparse.py dense fused
echo "=== final bench.py ($(date +%H:%M:%S))"
timeout 3000 python bench.py
echo "=== perf pass done ($(date +%H:%M:%S))"
