#!/bin/bash
# Chain the oracle validation sweeps on the 1-core box: wait for the
# running v2 sweep (pid in /tmp/sweep.pid) to finish, then sweep the v1
# dataset (241 cases, incl. darcy) with the same resume semantics.
# Run from the .sweep_wt snapshot so live source edits cannot produce
# mixed-vintage module state mid-sweep (CLAUDE.md).
set -u
REPO=/root/repo
WT=$REPO/.sweep_wt
PID=$(cat /tmp/sweep.pid 2>/dev/null || echo "")
if [ -n "$PID" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 30; done
fi
cd "$WT"
export PDEBENCH_TPU_PLATFORM=cpu
export PDEBENCH_TPU_COMPILE_CACHE=$REPO/.jax_compile_cache
# constant_folding on XLA-CPU stalls big scatter-add folds 10-30x (CLAUDE.md)
export XLA_FLAGS=--xla_disable_hlo_passes=constant_folding
exec nice -n 10 python scripts/test_oracle_cases.py --version v1 \
  --resume-jsonl "$REPO/results/oracle_sweep_v1_progress.jsonl" \
  >> "$REPO/results/sweep_v1_r2.log" 2>&1
