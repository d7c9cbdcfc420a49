#!/bin/bash
# Resume the full reference sweep (source.cpp:54-70 protocol) on the
# real chip. Reps scale down with size: the axon tunnel moves ~30 MB/s,
# so wall-clock transfer phases at 992 MB cost ~2 min/rep; the kernel
# columns come from the amortized in-device loop (--device-timing) and
# do not depend on reps. A real PCIe/ICI rig can re-run with --reps 10.
set -u
cd /root/repo
OUT=benchmarks/results_v5e.txt
LOG=/tmp/sweep/sweep3.log
mkdir -p /tmp/sweep

run() { # run <timeout_s> <sizes...> -- <reps>
  local t=$1; shift
  local sizes=()
  while [ "$1" != "--" ]; do sizes+=("$1"); shift; done
  shift; local reps=$1
  echo "[sweep] sizes=${sizes[*]} reps=$reps" >>"$LOG"
  timeout "$t" python -u -m benchmarks.report \
    --sizes "${sizes[@]}" --reps "$reps" --device-timing \
    --out "$OUT" >>"$LOG" 2>&1
  echo "[sweep] sizes=${sizes[*]} rc=$?" >>"$LOG"
}

# 992 MB (s=256) configs run BEFORE s=128: they are the sweep's
# headline scale and the round can end mid-sweep — resume keeps
# whatever completed. s=16/32 phases ran earlier (resume skips them).
run 4500 16 -- 10
run 4500 32 -- 5
run 6000 64 -- 3
run 12000 256 -- 2
run 8000 128 -- 2
echo "[sweep] all done" >>"$LOG"
