#!/bin/bash
# Diagnostic (round 4): is the 80k GPRF-100 QoR gap (0.00073 vs the
# reference's 0.00064) caused by the device scan-L-BFGS trajectory?
# Run the SAME problem through the host engine — scipy L-BFGS-B with its
# strong-Wolfe line search, i.e. reference-identical optimizer semantics —
# with per-eval TPU dispatch.  If this run reaches ~0.00064 the gap is the
# optimizer; if it stalls at ~0.00073 the gap is data/precision/landscape.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
# separate base dir: the run-dir name does not encode the engine, and the
# device-engine artifacts already live under ~/gprf_experiments
export GPRF_EXPERIMENTS="$HOME/gprf_experiments_host"
mkdir -p "$GPRF_EXPERIMENTS"
ln -sfn "$HOME/gprf_experiments/synthetic_datasets" "$GPRF_EXPERIMENTS/synthetic_datasets" 2>/dev/null || true
cd /root/repo
name=gprf80k_100_host
if [ -f "docs/runs/$name/results.txt" ]; then
  echo "=== $name: already have results.txt, skipping"; exit 0
fi
echo "=== $name ($(date +%H:%M:%S))"
timeout 5400 python -m gprf_tpu.cli.gprfopt \
  --ntrain=80000 --ntest=500 --lscale=0.021213 --obs_std=0.007071 --yd=50 \
  --task=x --nblocks=100 --local_dist=0.1 --engine=host --maxsec=4200 \
  2>&1 | tee "/tmp/eighty_$name.log"
d=$(grep -m1 '^experiment dir:' "/tmp/eighty_$name.log" | sed 's/^experiment dir: //')
if [ -n "$d" ] && [ -f "$d/results.txt" ]; then
  mkdir -p "docs/runs/$name"
  cp "$d/results.txt" "$d/log.txt" "docs/runs/$name/" 2>/dev/null
  echo "=== $name: copied from $d"
else
  echo "=== $name: FAILED"
fi
