#!/bin/bash
# Unattended hardware validation + measurement queue. Run when the TPU
# tunnel is healthy:   bash benchmarks/hw_queue.sh [logdir]
# Order: sanity gate -> REQUIRED differential (kernel changes) ->
# headline bench -> batch bench -> decode micro -> full reference sweep
# (resumable; re-running this script skips completed sweep configs).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/hw_queue}
mkdir -p "$LOG"

echo "[hw_queue] sanity gate" >&2
timeout 120 python -u -c "
import jax, jax.numpy as jnp
print('sanity:', int(jax.device_put(jnp.arange(8)).sum()))" \
    > "$LOG/sanity.log" 2>&1 || { echo "[hw_queue] TPU unhealthy" >&2; exit 1; }

echo "[hw_queue] differential matrix" >&2
timeout 3000 python -u tests/tpu_differential.py --out TPU_DIFF.json \
    > "$LOG/diff.log" 2>&1
grep -q "DIFFERENTIAL OK" "$LOG/diff.log" \
    || { echo "[hw_queue] DIFFERENTIAL FAILED — stopping" >&2; exit 2; }

echo "[hw_queue] headline bench" >&2
timeout 580 python -u bench.py > "$LOG/bench.log" 2>&1

echo "[hw_queue] batch bench" >&2
timeout 1200 python -u -m benchmarks.batch_bench --cols 256 --mbit 64 \
    > "$LOG/batch.log" 2>&1

echo "[hw_queue] decode micro" >&2
timeout 580 python -u -m benchmarks.micro --which dec --density 0.0625 0.5 \
    -K 5 > "$LOG/dec.log" 2>&1

echo "[hw_queue] full reference sweep (resumable)" >&2
timeout 9000 python -u -m benchmarks.report \
    --reps 10 --device-timing --out benchmarks/results_v5e.txt \
    > "$LOG/sweep.log" 2>&1

echo "[hw_queue] done; logs in $LOG" >&2
tail -1 "$LOG/bench.log" "$LOG/batch.log" "$LOG/dec.log" 2>/dev/null
