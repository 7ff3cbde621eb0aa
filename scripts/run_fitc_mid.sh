#!/bin/bash
# Densify the FITC scaling suite with the reference's intermediate grid
# points (n=5k, 10k; lscale=6/sqrt(n), obs_std=2/sqrt(n), nblocks =
# floor(sqrt(n/200))^2, task=xcov) — reference rows exist for all of
# these in gprf_results.tgz.  Sparse baselines run the VarDTC estimator
# (see run_fitc_titsias.sh header).
# Usage: nohup bash scripts/run_fitc_mid.sh > /tmp/fitc_mid.log 2>&1 &
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export GPRF_EXPERIMENTS="${GPRF_EXPERIMENTS:-$HOME/gprf_experiments}"
cd /root/repo

run_one () {
  name=$1; shift
  if [ -f "docs/runs/fitc_suite/$name/results.txt" ]; then
    echo "=== $name: already have results.txt, skipping"; return
  fi
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 2400 python -m gprf_tpu.cli.gprfopt --ntest=500 --yd=50 --task=xcov --seed=0 "$@" 2>&1 | tee "/tmp/fitc_$name.log"
  d=$(grep -m1 '^experiment dir:' "/tmp/fitc_$name.log" | sed 's/^experiment dir: //')
  if [ -n "$d" ] && [ -f "$d/results.txt" ]; then
    mkdir -p "docs/runs/fitc_suite/$name"
    cp "$d/results.txt" "docs/runs/fitc_suite/$name/" 2>/dev/null
    echo "=== $name: copied from $d"
  else
    echo "=== $name: FAILED (no results.txt)"
  fi
}

suite_n () {
  n=$1; ls=$2; os=$3; nb200=$4
  BASE="--ntrain=$n --lscale=$ls --obs_std=$os"
  run_one "gprf_$n"  $BASE --nblocks=$nb200 --local_dist=0.1 --engine=device --maxsec=900
  run_one "local_$n" $BASE --nblocks=$nb200 --local_dist=1.0 --engine=device --maxsec=900
  run_one "fitc500_${n}_titsias" $BASE --nblocks=1 --gplvm_type=titsias --num_inducing=500  --max_iters=4000 --maxsec=1800
  run_one "fitcbig_${n}_titsias" $BASE --nblocks=1 --gplvm_type=titsias --num_inducing=2000 --max_iters=4000 --maxsec=1800
}

suite_n 5000  0.084853 0.028284 25
suite_n 10000 0.060000 0.020000 49
echo "=== fitc mid rows done ($(date +%H:%M:%S))"
