#!/bin/bash
# Round-2 (driver round numbering) endgame chain on the 1-core box:
# 1) finish the v2 oracle sweep tail (73 complex-domain cases), then
# 2) resume the CPU-direct baseline freezer,
# both killed at DEADLINE_EPOCH so the round-end driver bench runs on a
# quiet box. Runs from the .sweep_wt snapshot so live source edits
# cannot create mixed-vintage module state mid-sweep (CLAUDE.md).
set -u
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH}
REPO=/root/repo
WT=$REPO/.sweep_wt
cd "$WT"
export PDEBENCH_TPU_PLATFORM=cpu
export PDEBENCH_TPU_COMPILE_CACHE=$REPO/.jax_compile_cache
# constant_folding on XLA-CPU stalls big scatter-add folds 10-30x (CLAUDE.md)
export XLA_FLAGS=--xla_disable_hlo_passes=constant_folding

budget() { echo $((DEADLINE_EPOCH - $(date +%s))); }

B=$(budget)
if [ "$B" -gt 120 ]; then
  timeout "$B" nice -n 10 python scripts/test_oracle_cases.py \
    --resume-jsonl "$REPO/results/oracle_sweep_progress.jsonl" \
    --order-file "$REPO/results/sweep_order_r4.txt" \
    >> "$REPO/results/sweep_r5.log" 2>&1
fi

B=$(budget)
if [ "$B" -gt 120 ]; then
  timeout "$B" nice -n 10 python scripts/freeze_cpu_baseline.py \
    --resume-jsonl "$REPO/results/cpu_baseline_times.jsonl" \
    >> "$REPO/results/freeze_baseline_r5.log" 2>&1
fi
echo "chain5 done at $(date -u)" >> "$REPO/results/chain5_r2.log"
