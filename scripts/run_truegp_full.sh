#!/bin/bash
# truegp suite with FULL predictive analysis (--analyze_full): produces the
# SMSE / MSLL columns for every GPRF/Local block count and the full GP —
# VERDICT round-4 weak #5.  Note the reference's SHIPPED results.txt files
# carry zeros in all six predictive columns (verified across all 222 dirs in
# gprf_results.tgz), so the comparison axis is our own true-latent oracle
# rows plus cross-family orderings.
#
# Usage: nohup bash scripts/run_truegp_full.sh > /tmp/truegp_full.log 2>&1 &
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export GPRF_EXPERIMENTS="${GPRF_EXPERIMENTS:-$HOME/gprf_experiments}"
cd /root/repo
BASE="--ntrain=10000 --ntest=500 --lscale=0.06 --obs_std=0.02 --yd=50 --task=x --engine=device --analyze_full"

run_one () {
  name=$1; shift
  if [ -f "docs/runs/truegp_full/$name/results.txt" ]; then
    echo "=== $name: already have results.txt, skipping"
    return
  fi
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 4000 python -m gprf_tpu.cli.gprfopt $BASE "$@" 2>&1 | tee "/tmp/truegp_$name.log" | tail -2
  d=$(grep -m1 '^experiment dir:' "/tmp/truegp_$name.log" | sed 's/^experiment dir: //')
  if [ -n "$d" ] && [ -f "$d/results.txt" ]; then
    mkdir -p "docs/runs/truegp_full/$name"
    cp "$d/results.txt" "$d/log.txt" "docs/runs/truegp_full/$name/" 2>/dev/null
    echo "=== $name: copied from $d"
  else
    echo "=== $name: FAILED (no results.txt)"
  fi
}

run_one gprf9 --nblocks=9 --local_dist=0.1 --maxsec=600
run_one gprf25 --nblocks=25 --local_dist=0.1 --maxsec=600
run_one gprf49 --nblocks=49 --local_dist=0.1 --maxsec=600
run_one gprf100 --nblocks=100 --local_dist=0.1 --maxsec=600
run_one local9 --nblocks=9 --local_dist=1.0 --maxsec=600
run_one local25 --nblocks=25 --local_dist=1.0 --maxsec=600
run_one local49 --nblocks=49 --local_dist=1.0 --maxsec=600
run_one local100 --nblocks=100 --local_dist=1.0 --maxsec=600
run_one fullgp --nblocks=1 --local_dist=1.0 --maxsec=900
echo "=== truegp full suite done ($(date +%H:%M:%S))"
