#!/bin/bash
# Round-3 chain: wait for the v2 sweep tail (pid $1), then resume the
# CPU-direct baseline freezer on the quiet box until DEADLINE_EPOCH,
# then stop so the round-end driver bench runs quiet.
set -u
P1=${1:?v2 sweep pid}
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH}
REPO=/root/repo
WT=$REPO/.sweep_wt
while kill -0 "$P1" 2>/dev/null; do
  if [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; then
    kill "$P1" 2>/dev/null
    sleep 5
    exit 0
  fi
  sleep 30
done
NOW=$(date +%s)
BUDGET=$((DEADLINE_EPOCH - NOW))
[ "$BUDGET" -le 60 ] && exit 0
cd "$WT"
export PDEBENCH_TPU_PLATFORM=cpu
export PDEBENCH_TPU_COMPILE_CACHE=$REPO/.jax_compile_cache
export XLA_FLAGS=--xla_disable_hlo_passes=constant_folding
exec timeout "$BUDGET" nice -n 10 python scripts/freeze_cpu_baseline.py \
  --resume-jsonl "$REPO/results/cpu_baseline_times.jsonl" \
  >> "$REPO/results/freeze_baseline_r3.log" 2>&1
