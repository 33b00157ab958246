#!/bin/bash
# Stage-3 chain: wait for the v2 sweep (/tmp/sweep.pid) and the v1 sweep
# (/tmp/chain.pid — sweep_chain.sh exec's into the v1 python) to finish,
# then freeze per-case CPU-direct baseline times (BASELINE.md time-gate
# table, scripts/freeze_cpu_baseline.py) until the round deadline.
# DEADLINE_EPOCH: hard stop so the round-end bench runs on a quiet box.
set -u
REPO=/root/repo
WT=$REPO/.sweep_wt
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH}
for f in /tmp/sweep.pid /tmp/chain.pid; do
  PID=$(cat "$f" 2>/dev/null || echo "")
  if [ -n "$PID" ]; then
    while kill -0 "$PID" 2>/dev/null; do
      if [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; then
        kill "$PID" 2>/dev/null
        sleep 5
        exit 0
      fi
      sleep 30
    done
  fi
done
NOW=$(date +%s)
BUDGET=$((DEADLINE_EPOCH - NOW))
[ "$BUDGET" -le 60 ] && exit 0
cd "$WT"
export PDEBENCH_TPU_PLATFORM=cpu
export PDEBENCH_TPU_COMPILE_CACHE=$REPO/.jax_compile_cache
exec timeout "$BUDGET" nice -n 10 python scripts/freeze_cpu_baseline.py \
  --resume-jsonl "$REPO/results/cpu_baseline_times.jsonl" \
  >> "$REPO/results/freeze_baseline_r2.log" 2>&1
