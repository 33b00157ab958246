#!/bin/bash
# Round-2 (driver numbering) final background chain on the 1-core box:
# 1) re-measure the 18 contention-inflated rd_* sweep records
#    (rescrub_contended_r2.sh), then
# 2) resume the CPU-direct baseline freezer,
# both killed at DEADLINE_EPOCH so the round-end driver bench runs on
# a quiet box. Foreground work after launch must be edit-only
# (CLAUDE.md: concurrent CPU work corrupts wall-clock timings).
set -u
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH}
REPO=/root/repo
cd "$REPO"
export PDEBENCH_TPU_PLATFORM=cpu
export PDEBENCH_TPU_COMPILE_CACHE=$REPO/.jax_compile_cache
export XLA_FLAGS=--xla_disable_hlo_passes=constant_folding

budget() { echo $((DEADLINE_EPOCH - $(date +%s))); }

B=$(budget)
if [ "$B" -gt 1800 ]; then
  # only rescrub with ample budget: if killed mid-way the sweep jsonl
  # would be left <645 records (the dropped cases re-run one by one)
  timeout "$B" nice -n 10 bash scripts/rescrub_contended_r2.sh \
    >> results/rescrub_r2.log 2>&1
fi

B=$(budget)
if [ "$B" -gt 120 ]; then
  timeout "$B" nice -n 10 python scripts/freeze_cpu_baseline.py \
    --resume-jsonl results/cpu_baseline_times.jsonl \
    --order-file results/freeze_order_cheap.txt \
    >> results/freeze_baseline_r7.log 2>&1
fi
echo "chain7 done at $(date -u)" >> results/chain7_r2.log
