#!/bin/bash
# Run the remaining eighty-suite rows (reference gprfopt_analyze.py:188-229)
# sequentially on the attached TPU and copy each run's artifacts into
# docs/runs/.  Rows already committed from earlier rounds (GPRF-100,
# Local-100, Local-900 continuation) are not re-run.
#
# Usage: nohup bash scripts/run_eighty_suite.sh > /tmp/eighty_suite.log 2>&1 &
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export GPRF_EXPERIMENTS="${GPRF_EXPERIMENTS:-$HOME/gprf_experiments}"
cd /root/repo
BASE="--ntrain=80000 --ntest=500 --lscale=0.021213 --obs_std=0.007071 --yd=50 --task=x --engine=device --maxsec=900"

run_one () {
  name=$1; shift
  if [ -f "docs/runs/$name/results.txt" ]; then
    echo "=== $name: already have results.txt, skipping"
    return
  fi
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 3600 python -m gprf_tpu.cli.gprfopt $BASE "$@" 2>&1 | tee "/tmp/eighty_$name.log"
  d=$(grep -m1 '^experiment dir:' "/tmp/eighty_$name.log" | sed 's/^experiment dir: //')
  if [ -n "$d" ] && [ -f "$d/results.txt" ]; then
    mkdir -p "docs/runs/$name"
    cp "$d/results.txt" "$d/log.txt" "docs/runs/$name/" 2>/dev/null
    echo "=== $name: copied from $d"
  else
    echo "=== $name: FAILED (no results.txt)"
  fi
}

# VERDICT round-3 item 2: the GPRF family is the most plausible route to the
# reference's best 80k number (0.00064, from this family).
run_one gprf80k_196 --nblocks=196 --local_dist=0.1
run_one gprf80k_400 --nblocks=400 --local_dist=0.1
run_one gprf80k_900 --nblocks=900 --local_dist=0.1
run_one gprf80k_100_ms4 --nblocks=100 --local_dist=0.1 --multistart=4
# Long-budget single-start: our committed GPRF-100 run plateaus at a lower
# objective (ll 3.342M) than the reference reaches (3.361M) — check whether
# more scan-L-BFGS iterations close the optimization (not landscape) part.
run_one gprf80k_100_long --nblocks=100 --local_dist=0.1 --max_iters=1600 --maxsec=2400 --ftol=1e-8 --stall_patience=12
# Remaining Local rows for a complete suite figure.
run_one local80k_400 --nblocks=400 --local_dist=1.0
run_one local80k_196 --nblocks=196 --local_dist=1.0
run_one local80k_36 --nblocks=36 --local_dist=1.0
run_one local80k_16 --nblocks=16 --local_dist=1.0
echo "=== suite done ($(date +%H:%M:%S))"
