#!/bin/bash
# VERDICT round-4 item 3: measure GPRF_SCHUR_PRECISION=high at the wide-m
# shapes and validate the preset's QoR.
#   (a) in-scan ablation at m=888 (the 80k/100-block shape) under both
#       precisions — fresh processes (toggles read once at import);
#   (b) a full 80k GPRF-100 QoR run under --schur_precision=high on the
#       exact draw, to compare against the default-precision 0.000652.
#
# Usage: nohup bash scripts/run_wide_precision.sh > /tmp/wide_prec.log 2>&1 &
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export GPRF_EXPERIMENTS="${GPRF_EXPERIMENTS:-$HOME/gprf_experiments}"
cd /root/repo

echo "=== ablate_wide @ highest (default) ($(date +%H:%M:%S))"
timeout 3000 python scripts/ablate_wide.py default lossonly unary 2>&1 | tail -4
echo "=== ablate_wide @ high ($(date +%H:%M:%S))"
GPRF_SCHUR_PRECISION=high timeout 3000 python scripts/ablate_wide.py default lossonly unary 2>&1 | tail -4

echo "=== 80k GPRF-100 QoR run @ --schur_precision=high ($(date +%H:%M:%S))"
timeout 4000 python -m gprf_tpu.cli.gprfopt --ntrain=80000 --ntest=500 \
  --lscale=0.021213 --obs_std=0.007071 --yd=50 --task=x --engine=device \
  --maxsec=900 --nblocks=100 --local_dist=0.1 --schur_precision=high \
  2>&1 | tee /tmp/exact_gprf80k_100_high.log | tail -2
d=$(grep -m1 '^experiment dir:' /tmp/exact_gprf80k_100_high.log | sed 's/^experiment dir: //')
if [ -n "$d" ] && [ -f "$d/results.txt" ]; then
  mkdir -p docs/runs/gprf80k_100_yexact_high
  cp "$d/results.txt" "$d/log.txt" docs/runs/gprf80k_100_yexact_high/
  echo "=== copied from $d"
  tail -2 "$d/results.txt"
fi
echo "=== wide precision pass done ($(date +%H:%M:%S))"
