#!/bin/bash
# Re-run the eighty suite (reference gprfopt_analyze.py:188-229) on the
# round-5 EXACT banded prior draw (GPRF_SAMPLER=exact, now the large-n
# default): the sampler-fidelity control showed the legacy Vecchia draw
# depressed the GPRF family ~11% while Local rows sat at parity.
#
# Usage: nohup bash scripts/run_eighty_exact.sh > /tmp/eighty_exact.log 2>&1 &
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export GPRF_SAMPLER=exact
export GPRF_EXPERIMENTS="${GPRF_EXPERIMENTS:-$HOME/gprf_experiments}"
cd /root/repo
BASE="--ntrain=80000 --ntest=500 --lscale=0.021213 --obs_std=0.007071 --yd=50 --task=x --engine=device --maxsec=900"
G100DIR="$GPRF_EXPERIMENTS/80000_80500_100_0.021213_0.007071_0.1000_50_l-bfgs-b_x_-1_0.0100_s0_gprf0_yexact"

run_one () {
  name=$1; shift
  if [ -f "docs/runs/$name/results.txt" ]; then
    echo "=== $name: already have results.txt, skipping"
    return
  fi
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 4000 python -m gprf_tpu.cli.gprfopt $BASE "$@" 2>&1 | tee "/tmp/exact_$name.log" | tail -2
  d=$(grep -m1 '^experiment dir:' "/tmp/exact_$name.log" | sed 's/^experiment dir: //')
  if [ -n "$d" ] && [ -f "$d/results.txt" ]; then
    mkdir -p "docs/runs/$name"
    cp "$d/results.txt" "$d/log.txt" "docs/runs/$name/" 2>/dev/null
    echo "=== $name: copied from $d"
  else
    echo "=== $name: FAILED (no results.txt)"
  fi
}

run_one gprf80k_196_yexact --nblocks=196 --local_dist=0.1
run_one gprf80k_400_yexact --nblocks=400 --local_dist=0.1
run_one gprf80k_900_yexact --nblocks=900 --local_dist=0.1
run_one local80k_400_yexact --nblocks=400 --local_dist=1.0
run_one local80k_196_yexact --nblocks=196 --local_dist=1.0
run_one local80k_36_yexact --nblocks=36 --local_dist=1.0
run_one local80k_16_yexact --nblocks=16 --local_dist=1.0
run_one local80k_900_yexact --nblocks=900 --local_dist=1.0
# continuation rows (the basin-escape workflow the reference's --init_x
# supports): warm-start the 900-block runs from the GPRF-100 solution.
# On a fresh machine the experiment cache is gone — regenerate the
# GPRF-100 checkpoint first, then resolve the latest step file.
if ! ls "$G100DIR"/step_*_X.npy >/dev/null 2>&1; then
  echo "=== regenerating GPRF-100 exact checkpoint ($(date +%H:%M:%S))"
  timeout 4000 python -m gprf_tpu.cli.gprfopt $BASE --nblocks=100 --local_dist=0.1 2>&1 | tail -2
fi
GPRF100=$(ls "$G100DIR"/step_*_X.npy 2>/dev/null | sort | tail -1)
if [ -n "$GPRF100" ]; then
  run_one local80k_900_cont_yexact --nblocks=900 --local_dist=1.0 --init_x="$GPRF100"
  run_one gprf80k_900_cont_yexact --nblocks=900 --local_dist=0.1 --init_x="$GPRF100"
else
  echo "=== no GPRF-100 checkpoint; skipping continuation rows"
fi
echo "=== exact eighty suite done ($(date +%H:%M:%S))"
