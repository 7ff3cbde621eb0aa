#!/bin/bash
# Remaining VarDTC (titsias) rows so the FITC-suite baseline family is a
# single estimator end-to-end (see run_fitc_titsias.sh header).
# Usage: nohup bash scripts/run_fitc_titsias2.sh [wait_pid] > /tmp/fitc_titsias2.log 2>&1 &
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export GPRF_EXPERIMENTS="${GPRF_EXPERIMENTS:-$HOME/gprf_experiments}"
cd /root/repo

if [ $# -ge 1 ] && [ -n "$1" ]; then
  echo "waiting for pid $1 to exit"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

run_one () {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 4000 python -m gprf_tpu.cli.gprfopt --ntest=500 --yd=50 --task=xcov --seed=0 \
    --gplvm_type=titsias --nblocks=1 --max_iters=4000 --maxsec=3000 "$@" 2>&1 | tee "/tmp/fitc_$name.log"
  d=$(grep -m1 '^experiment dir:' "/tmp/fitc_$name.log" | sed 's/^experiment dir: //')
  if [ -n "$d" ] && [ -f "$d/results.txt" ]; then
    mkdir -p "docs/runs/fitc_suite/$name"
    cp "$d/results.txt" "docs/runs/fitc_suite/$name/" 2>/dev/null
    echo "=== $name: copied from $d"
  else
    echo "=== $name: FAILED (no results.txt)"
  fi
}

run_one "fitc500_2000_titsias"  --ntrain=2000  --lscale=0.134164 --obs_std=0.044721 --num_inducing=500
run_one "fitcbig_2000_titsias"  --ntrain=2000  --lscale=0.134164 --obs_std=0.044721 --num_inducing=1000
run_one "fitc500_40000_titsias" --ntrain=40000 --lscale=0.030000 --obs_std=0.010000 --num_inducing=500
run_one "fitc500_80000_titsias" --ntrain=80000 --lscale=0.021213 --obs_std=0.007071 --num_inducing=500
run_one "fitcbig_80000_titsias" --ntrain=80000 --lscale=0.021213 --obs_std=0.007071 --num_inducing=1000
echo "=== titsias2 runs done ($(date +%H:%M:%S))"
