#!/bin/bash
# B=900 pair-path variants (VERDICT r4 item 5, perf half).  The production
# B=900 shape (E=3422, m=120) measures 1662 ms/step (0.10% MFU) — ~50x
# worse per-pair efficiency than the B=100 shape.  The pair MVN at m=120
# 2x2-splits into 64/56 leaves under the default leaf 96 even though the
# single-kernel caps (chol 168 / MVN 144) admit m=120 directly; and the
# chol+inv formulations replace the MVN kernel's sequential triangular
# substitution (~m*dy steps) with MXU einsums.  Fresh process per variant
# (env toggles read at import).
#
# Usage: nohup bash scripts/run_b900_variants.sh > /tmp/b900_variants.log 2>&1 &
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export GPRF_EXPERIMENTS="${GPRF_EXPERIMENTS:-$HOME/gprf_experiments}"
export GPRF_SAMPLER=exact
export GPRF_ABLATE_BLOCKS=900
export GPRF_ABLATE_LOCAL_DIST=0.1
cd /root/repo

if [ -f /tmp/r5q.pid ]; then
  while kill -0 "$(cat /tmp/r5q.pid)" 2>/dev/null; do sleep 30; done
fi

run_v () {
  echo "=== $1 ($(date +%H:%M:%S))"
  shift
  env "$@" timeout 2400 python scripts/ablate_wide.py default lossonly 2>&1 | grep -v WARNING
}

run_v "E-sweep 1740 (threshold edges truncated)" GPRF_ABLATE_MAX_E=1740
run_v "E-sweep 2560" GPRF_ABLATE_MAX_E=2560
run_v "leaf=144 (single-kernel MVN at m=120)" GPRF_SPLIT_LEAF=144
run_v "pair_cholinv (chol+inv kernel + einsum solve)" GPRF_PAIR_CHOLINV=1
run_v "pair_cholinv + leaf=144" GPRF_PAIR_CHOLINV=1 GPRF_SPLIT_LEAF=144
run_v "mvn_inv (fused MVN+inverse leaf)" GPRF_MVN_INV=1
echo "=== b900 variants done ($(date +%H:%M:%S))"
