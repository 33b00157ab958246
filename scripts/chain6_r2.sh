#!/bin/bash
# Round-2 (driver numbering) final background stage: resume the CPU
# baseline freezer alone on a quiet box, killed at DEADLINE_EPOCH so
# the round-end driver bench is uncontended. Run only after the v2
# sweep tail and the foreground burst (tests / A/B / cross-check) are
# done — the freeze t_cpu is wall-clock on a 1-core box (CLAUDE.md).
set -u
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH}
REPO=/root/repo
cd "$REPO"
export PDEBENCH_TPU_PLATFORM=cpu
export PDEBENCH_TPU_COMPILE_CACHE=$REPO/.jax_compile_cache
export XLA_FLAGS=--xla_disable_hlo_passes=constant_folding

B=$((DEADLINE_EPOCH - $(date +%s)))
if [ "$B" -gt 120 ]; then
  timeout "$B" nice -n 10 python scripts/freeze_cpu_baseline.py \
    --resume-jsonl results/cpu_baseline_times.jsonl \
    >> results/freeze_baseline_r6.log 2>&1
fi
echo "chain6 done at $(date -u)" >> results/chain6_r2.log
