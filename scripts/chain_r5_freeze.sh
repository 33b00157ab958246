#!/bin/bash
# Round-5 freeze-tail window: resume the CPU baseline table on a QUIET
# box (stop every TPU sweep first — 1-core box, wall-clock timing).
# Usage: DEADLINE_EPOCH=<epoch> bash scripts/chain_r5_freeze.sh
# Order: results/freeze_order_r5.txt (helmholtz_3d_k6_high first — its
# TPU number 7.44 s needs the frozen direct time for the comparison —
# then cheap-first). The freezer records and moves on at --timeout.
set -u
cd /root/repo
export XLA_FLAGS="--xla_disable_hlo_passes=constant_folding ${XLA_FLAGS:-}"

nice -n 5 timeout $(( ${DEADLINE_EPOCH:?set DEADLINE_EPOCH} - $(date +%s) )) \
  python scripts/freeze_cpu_baseline.py \
    --resume-jsonl results/cpu_baseline_times.jsonl \
    --order-file results/freeze_order_r5.txt \
    --timeout 2400 \
  2>&1 | tee -a results/freeze_baseline_r5.log
echo "freeze window done: $(grep -c '"ok": true' results/cpu_baseline_times.jsonl) ok records"
