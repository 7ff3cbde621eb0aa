#!/bin/bash
# Re-run the FITC baseline rows with a converged optimizer budget
# (--max_iters=2000).  The first pass used the reference's literal scipy
# budget (maxiter=200, gprfopt.py:307), which the reference applies to
# GPy's *transformed* parameter array; on our raw packing 200 iterations
# leaves the n>=20k rows far from converged.  Overwrites the
# docs/runs/fitc_suite/fitc* artifacts.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export GPRF_EXPERIMENTS="${GPRF_EXPERIMENTS:-$HOME/gprf_experiments}"
cd /root/repo

run_one () {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 3600 python -m gprf_tpu.cli.gprfopt --ntest=500 --yd=50 --task=xcov --seed=0 "$@" 2>&1 | tee "/tmp/fitc_$name.log"
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
  n=$1; ls=$2; os=$3; ninduce_big=$4
  BASE="--ntrain=$n --lscale=$ls --obs_std=$os --max_iters=2000 --maxsec=2400"
  run_one "fitc500_$n" $BASE --nblocks=1 --gplvm_type=sparse --num_inducing=500
  run_one "fitcbig_$n" $BASE --nblocks=1 --gplvm_type=sparse --num_inducing=$ninduce_big
}

suite_n 2000  0.134164 0.044721 1000
suite_n 20000 0.042426 0.014142 2000
suite_n 40000 0.030000 0.010000 2000
suite_n 80000 0.021213 0.007071 1000
echo "=== fitc rerun done ($(date +%H:%M:%S))"
