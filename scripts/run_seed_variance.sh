#!/bin/bash
# Seed-variance probe at the 80k GPRF-100 shape (round 4): three optimizers
# (device scan-L-BFGS, host scipy strong-Wolfe, f64 refine) all land at
# mad 0.000730-0.000739 on the seed-0 dataset while the reference's
# single seed-0 draw reports 0.000640.  Measure the across-draw spread of
# the final mad by re-running the identical config on fresh draws
# (seeds 1, 2).  If the spread covers ~1e-4, the residual gap is dataset
# realization, not implementation.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export GPRF_EXPERIMENTS="${GPRF_EXPERIMENTS:-$HOME/gprf_experiments}"
cd /root/repo
for seed in 1 2; do
  name=gprf80k_100_s$seed
  if [ -f "docs/runs/$name/results.txt" ]; then
    echo "=== $name: already have results.txt, skipping"; continue
  fi
  echo "=== $name ($(date +%H:%M:%S))"
  timeout 3000 python -m gprf_tpu.cli.gprfopt \
    --ntrain=80000 --ntest=500 --lscale=0.021213 --obs_std=0.007071 --yd=50 \
    --task=x --nblocks=100 --local_dist=0.1 --engine=device --maxsec=900 \
    --seed=$seed 2>&1 | tee "/tmp/eighty_$name.log"
  d=$(grep -m1 '^experiment dir:' "/tmp/eighty_$name.log" | sed 's/^experiment dir: //')
  if [ -n "$d" ] && [ -f "$d/results.txt" ]; then
    mkdir -p "docs/runs/$name"
    cp "$d/results.txt" "$d/log.txt" "docs/runs/$name/" 2>/dev/null
    echo "=== $name: copied from $d"
  else
    echo "=== $name: FAILED"
  fi
done
echo "=== seed variance done ($(date +%H:%M:%S))"
