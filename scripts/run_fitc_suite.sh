#!/bin/bash
# FITC scaling suite reproduction (VERDICT round-3 item 5; reference
# gprfopt_analyze.py:280-347): task=xcov rows at a representative subset of
# the reference's n grid — n in {2k, 20k, 40k, 80k} x {GPRF-bs200,
# Local-bs200, FITC-500, FITC-2000/1000} — sequential on the attached TPU.
# nblocks = floor(sqrt(n/200))^2 per the reference's get_nblocks.
#
# Usage: nohup bash scripts/run_fitc_suite.sh > /tmp/fitc_suite.log 2>&1 &
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export GPRF_EXPERIMENTS="${GPRF_EXPERIMENTS:-$HOME/gprf_experiments}"
cd /root/repo

run_one () {
  name=$1; shift
  if [ -f "docs/runs/fitc_suite/$name/results.txt" ]; then
    echo "=== $name: already have results.txt, skipping"
    return
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
  n=$1; ls=$2; os=$3; nb200=$4; ninduce_big=$5
  BASE="--ntrain=$n --lscale=$ls --obs_std=$os"
  run_one "gprf_$n"  $BASE --nblocks=$nb200 --local_dist=0.1 --engine=device --maxsec=900
  run_one "local_$n" $BASE --nblocks=$nb200 --local_dist=1.0 --engine=device --maxsec=900
  run_one "fitc500_$n"  $BASE --nblocks=1 --gplvm_type=sparse --num_inducing=500  --maxsec=1200
  run_one "fitcbig_$n"  $BASE --nblocks=1 --gplvm_type=sparse --num_inducing=$ninduce_big --maxsec=1800
}

suite_n 2000  0.134164 0.044721 9   1000
suite_n 20000 0.042426 0.014142 100 2000
suite_n 40000 0.030000 0.010000 196 2000
suite_n 80000 0.021213 0.007071 400 1000
echo "=== fitc suite done ($(date +%H:%M:%S))"
