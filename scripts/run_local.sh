#!/bin/bash
# Launcher wrapper for fleet runs: append-logs a single experiment command.
# Equivalent of the reference run_cloud.sh (activate env, cd, log to file);
# run_local_limit.sh adds the reference's 16 GB virtual-memory cap
# (run_cloud_limit.sh:6).
set -u
SCRIPT=$1
shift
cd "$(dirname "$0")/.."
mkdir -p logs
exec python -m "gprf_tpu.cli.${SCRIPT%.py}" "$@" >> "logs/run_$(date +%s)_$$.log" 2>&1
