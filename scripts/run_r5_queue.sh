#!/bin/bash
# Round-5 serialized TPU queue (single chip — one process at a time):
#   1. wide-m precision pass (VERDICT r4 item 3)
#   2. B=900 per-step ablation at the production edge set (item 5, perf half)
#   3. truegp suite with full predictive analysis (item 6)
# Waits for the eighty-exact suite to release the chip first.
#
# Usage: nohup bash scripts/run_r5_queue.sh > /tmp/r5_queue.log 2>&1 &
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export GPRF_EXPERIMENTS="${GPRF_EXPERIMENTS:-$HOME/gprf_experiments}"
cd /root/repo

if [ -f /tmp/eighty.pid ]; then
  while kill -0 "$(cat /tmp/eighty.pid)" 2>/dev/null; do sleep 30; done
fi
echo "=== chip free; starting wide-precision pass ($(date +%H:%M:%S))"
bash scripts/run_wide_precision.sh 2>&1

echo "=== B=900 ablation at the production edge set ($(date +%H:%M:%S))"
GPRF_SAMPLER=exact GPRF_ABLATE_BLOCKS=900 GPRF_ABLATE_LOCAL_DIST=0.1 \
  timeout 3000 python scripts/ablate_wide.py default lossonly unary \
  2>&1 | tee /tmp/ablate_900.log
echo "=== B=900 ablation, unary-only edge ablation ($(date +%H:%M:%S))"
GPRF_SAMPLER=exact GPRF_ABLATE_BLOCKS=900 \
  timeout 3000 python scripts/ablate_wide.py default lossonly \
  2>&1 | tee /tmp/ablate_900_grid8.log

echo "=== truegp full predictive suite ($(date +%H:%M:%S))"
bash scripts/run_truegp_full.sh 2>&1

echo "=== bench.py warm (compile-cache prime for the driver capture) ($(date +%H:%M:%S))"
timeout 3000 python bench.py 2>&1 | tail -3
echo "=== r5 queue done ($(date +%H:%M:%S))"
