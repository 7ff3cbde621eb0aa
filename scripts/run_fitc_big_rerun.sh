#!/bin/bash
# Re-run the two weak FITC-big rows (n=20k/40k, 2000 inducing) with the
# round-4 restart-on-early-abort sgplvm driver and a long budget.  The
# first converged-budget pass still terminated at ~200 evals (scipy
# line-search abort on f32 gradients); the driver now restarts L-BFGS-B
# from the current point until --max_iters is spent.
# Usage: nohup bash scripts/run_fitc_big_rerun.sh [wait_pid] > /tmp/fitc_big_rerun.log 2>&1 &
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export GPRF_EXPERIMENTS="${GPRF_EXPERIMENTS:-$HOME/gprf_experiments}"
cd /root/repo

if [ $# -ge 1 ] && [ -n "$1" ]; then
  echo "waiting for pid $1 to exit"
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

run_one () {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 4000 python -m gprf_tpu.cli.gprfopt --ntest=500 --yd=50 --task=xcov --seed=0 "$@" 2>&1 | tee "/tmp/fitc_$name.log"
  d=$(grep -m1 '^experiment dir:' "/tmp/fitc_$name.log" | sed 's/^experiment dir: //')
  if [ -n "$d" ] && [ -f "$d/results.txt" ]; then
    mkdir -p "docs/runs/fitc_suite/$name"
    cp "$d/results.txt" "docs/runs/fitc_suite/$name/" 2>/dev/null
    echo "=== $name: copied from $d"
  else
    echo "=== $name: FAILED (no results.txt)"
  fi
}

run_one "fitcbig_20000" --ntrain=20000 --lscale=0.042426 --obs_std=0.014142 \
  --nblocks=1 --gplvm_type=sparse --num_inducing=2000 --max_iters=4000 --maxsec=3200
run_one "fitcbig_40000" --ntrain=40000 --lscale=0.030000 --obs_std=0.010000 \
  --nblocks=1 --gplvm_type=sparse --num_inducing=2000 --max_iters=4000 --maxsec=3200
echo "=== fitc big rerun done ($(date +%H:%M:%S))"
