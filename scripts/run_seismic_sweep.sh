#!/bin/bash
# Seismic xcov attack (VERDICT round-3 item 3b): threshold sweep x longer
# multistart budgets at rpc_blocksize=210, sequential on the attached TPU.
# Reference rows being chased (seismic_results.tgz, synthetic-catalog caveat
# in docs/RESULTS.md): xcov bs210 thresh0.6 12.97/9.16 km, thresh0.1
# 13.22/9.43 km.
#
# Usage: nohup bash scripts/run_seismic_sweep.sh > /tmp/seismic_sweep.log 2>&1 &
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
BASE="--npts=-1 --obs_std=20 --rpc_blocksize=210 --task=xcov --engine=device"

run_one () {
  name=$1; shift
  if [ -f "docs/runs/$name/results.txt" ]; then
    echo "=== $name: already have results.txt, skipping"
    return
  fi
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 3600 python -m gprf_tpu.cli.run_seismic $BASE "$@" 2>&1 | tee "/tmp/seis_$name.log"
  d=$(grep -m1 '^experiment dir:' "/tmp/seis_$name.log" | sed 's/^experiment dir: //')
  if [ -n "$d" ] && [ -f "$d/results.txt" ]; then
    mkdir -p "docs/runs/$name"
    cp "$d/results.txt" "$d/log.txt" "docs/runs/$name/" 2>/dev/null
    cp "$d/multistart.txt" "docs/runs/$name/" 2>/dev/null
    echo "=== $name: copied from $d"
  else
    echo "=== $name: FAILED (no results.txt)"
  fi
}

# R=8 with a longer iteration budget at the flagship threshold.
run_one seismic_xcov_ms8_long --threshold=0.6 --multistart=8 --max_iters=2000 --maxsec=1800 --refine_iters=20 --ftol=1e-8 --stall_patience=12
# Threshold sweep (denser / sparser edge sets) with multistart.
run_one seismic_xcov_t05_ms4 --threshold=0.5 --multistart=4 --max_iters=1200 --maxsec=1200 --refine_iters=20
run_one seismic_xcov_t07_ms4 --threshold=0.7 --multistart=4 --max_iters=1200 --maxsec=1200 --refine_iters=20
run_one seismic_xcov_t01_ms4 --threshold=0.1 --multistart=4 --max_iters=1200 --maxsec=1800 --refine_iters=20
# x-task at bs210 for the per-task anchor table (ref 211_0.6 x: 14.57/9.90).
run_one seismic_x210_device --threshold=0.6 --task=x --max_iters=1200 --maxsec=900
echo "=== seismic sweep done ($(date +%H:%M:%S))"
