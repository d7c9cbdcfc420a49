#!/bin/bash
# Finish the sweep: redo the deleted s=32 stall row, then the 992 MB
# and 496 MB sizes (post int32-overflow fix), with one retry each for
# transient tunnel errors. Resume skips completed rows.
set -u
cd /root/repo
OUT=benchmarks/results_v5e.txt
LOG=/tmp/sweep/sweep4.log
mkdir -p /tmp/sweep

run() { # run <timeout_s> <size> <reps>
  for attempt in 1 2; do
    echo "[sweep4] s=$2 reps=$3 attempt=$attempt" >>"$LOG"
    timeout "$1" python -u -m benchmarks.report \
      --sizes "$2" --reps "$3" --device-timing --out "$OUT" \
      >>"$LOG" 2>&1 && break
    echo "[sweep4] s=$2 attempt=$attempt rc=$? (retrying)" >>"$LOG"
    sleep 60
  done
}

run 1200 32 5
run 13000 256 2
run 9000 128 2
echo "[sweep4] all done" >>"$LOG"
