#!/bin/bash
# Round-5 FULL sweep refresh: every kernel changed (v4 stitch, encode
# route_bits, decode route tiers), so every committed row is
# re-measured. Per size: the tunnel is sanity-gated FIRST, the size's
# old rows are deleted exactly once (marker file), and the report runs
# resumably — re-running this script after any interruption continues
# where it stopped without re-measuring finished sizes (done markers)
# or losing partially-measured ones.
# Reps follow the tunnel-scaled mapping documented in the CSV header.
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/results_v5e.txt
LOG=${1:-/tmp/sweep5}
mkdir -p "$LOG"

sanity() {
  timeout 120 python -u -c \
    "import jax, jax.numpy as jnp; print(int(jnp.arange(8).sum()))" \
    >/dev/null 2>&1
}

drop_size_once() { # delete this size's rows from the CSV, once per round
  local s=$1
  [ -e "$LOG/dropped_$s" ] && return 0
  python - "$s" <<'EOF'
import sys
s = int(sys.argv[1])
n = s * 1024 * 992
path = "benchmarks/results_v5e.txt"
lines = open(path).readlines()
keep = [
    ln for ln in lines
    if not ln.split(",")[0].strip().isdigit()
    or int(ln.split(",")[0]) != n
]
import os, tempfile
fd, tmp = tempfile.mkstemp(dir="benchmarks")
with os.fdopen(fd, "w") as f:
    f.writelines(keep)
os.replace(tmp, path)  # atomic: an interruption cannot truncate the CSV
print(f"dropped {len(lines) - len(keep)} rows for s={s}", file=sys.stderr)
EOF
  touch "$LOG/dropped_$s"
}

run() { # run <timeout_s> <size> <reps>
  local t=$1 s=$2 reps=$3
  [ -e "$LOG/done_$s" ] && return 0
  for attempt in 1 2 3 4 5 6; do
    if ! sanity; then
      echo "[sweep5] s=$s attempt=$attempt sanity fail" >>"$LOG/sweep.log"
      sleep 120
      continue
    fi
    drop_size_once "$s"
    timeout "$t" python -u -m benchmarks.report --sizes "$s" \
      --reps "$reps" --device-timing --out "$OUT" >>"$LOG/sweep.log" 2>&1
    local rc=$?
    echo "[sweep5] s=$s attempt=$attempt rc=$rc" >>"$LOG/sweep.log"
    if [ "$rc" -eq 0 ]; then
      touch "$LOG/done_$s"
      return 0
    fi
  done
  echo "[sweep5] s=$s EXHAUSTED" >>"$LOG/sweep.log"
}

run 2000 1 10
run 2000 2 10
run 2000 4 10
run 2400 8 10
run 2400 16 10
run 2400 32 5
run 3600 64 3
run 9000 256 2
run 7200 128 2
echo "[sweep5] all done" >>"$LOG/sweep.log"
