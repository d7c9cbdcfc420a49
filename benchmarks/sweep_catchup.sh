#!/bin/bash
# Retry pass for sweep configs lost to transient tunnel errors: loops
# each size until its 16 density rows are present (resume skips done
# configs) or attempts run out. Run AFTER sweep_resume.sh.
set -u
cd /root/repo
OUT=benchmarks/results_v5e.txt
LOG=/tmp/sweep/catchup.log
mkdir -p /tmp/sweep

rows_for() { # rows_for <n_ints>
  awk -F, -v n="$1" '$1==n' "$OUT" | wc -l
}

for spec in "16:10:4500" "32:5:4500" "64:3:6000" "128:2:8000" "256:2:11000"; do
  s=${spec%%:*}; rest=${spec#*:}; reps=${rest%%:*}; t=${rest#*:}
  n=$((s * 1024 * 992))
  attempt=0
  gate_waits=0
  while [ "$attempt" -lt 3 ]; do
    have=$(rows_for "$n")
    [ "$have" -ge 16 ] && break
    # sanity gate: a dead tunnel must not burn a real attempt
    if ! timeout 120 python -c "
import jax, jax.numpy as jnp
assert int(jnp.sum(jnp.arange(8))) == 28
" >>"$LOG" 2>&1; then
      gate_waits=$((gate_waits + 1))
      echo "[catchup] sanity FAILED ($gate_waits); waiting 300 s" >>"$LOG"
      [ "$gate_waits" -ge 6 ] && break  # ~30 min down: give up this size
      sleep 300
      continue
    fi
    attempt=$((attempt + 1))
    echo "[catchup] s=$s attempt=$attempt have=$have/16" >>"$LOG"
    timeout "$t" python -u -m benchmarks.report \
      --sizes "$s" --reps "$reps" --device-timing --out "$OUT" \
      >>"$LOG" 2>&1
    echo "[catchup] s=$s attempt=$attempt rc=$?" >>"$LOG"
  done
done
echo "[catchup] done" >>"$LOG"
for s in 1 2 4 8 16 32 64 128 256; do
  n=$((s * 1024 * 992))
  echo "s=$s rows=$(rows_for $n)/16"
done
