#!/bin/bash
# VarDTC (titsias) runs for the truegp-suite FITC rows (n=10k, task=x) —
# same estimator identification as the FITC suite (GPy 0.6 SparseGPLVM
# defaults to VarDTC inference).  Results land in docs/runs/truegp_suite/
# under the run-dir name (which encodes gplvm_type).
# Usage: nohup bash scripts/run_truegp_titsias.sh > /tmp/truegp_titsias.log 2>&1 &
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export GPRF_EXPERIMENTS="${GPRF_EXPERIMENTS:-$HOME/gprf_experiments}"
cd /root/repo

run_one () {
  ni=$1
  echo "=== titsias$ni ($(date +%H:%M:%S))"
  timeout 2400 python -m gprf_tpu.cli.gprfopt --ntrain=10000 --ntest=500 \
    --lscale=0.06 --obs_std=0.02 --yd=50 --task=x --seed=0 --nblocks=1 \
    --gplvm_type=titsias --num_inducing=$ni --max_iters=2000 --maxsec=1800 \
    2>&1 | tee "/tmp/truegp_titsias$ni.log"
  d=$(grep -m1 '^experiment dir:' "/tmp/truegp_titsias$ni.log" | sed 's/^experiment dir: //')
  if [ -n "$d" ] && [ -f "$d/results.txt" ]; then
    name=$(basename "$d")
    mkdir -p "docs/runs/truegp_suite/$name"
    cp "$d/results.txt" "docs/runs/truegp_suite/$name/" 2>/dev/null
    echo "=== titsias$ni: copied ($name)"
  else
    echo "=== titsias$ni: FAILED"
  fi
}

run_one 500
run_one 1000
run_one 2000
echo "=== truegp titsias done ($(date +%H:%M:%S))"
