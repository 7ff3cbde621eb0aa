#!/bin/bash
# As run_local.sh but with the reference's 16 GB virtual memory cap.
ulimit -Sv 16000000
exec bash "$(dirname "$0")/run_local.sh" "$@"
