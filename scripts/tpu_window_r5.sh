#!/bin/bash
# Round-5 TPU validation window: re-measure the breach class first
# (post gate-fix + honest re-freeze, BASELINE.md #28-29), then the
# remaining strata. Run with the freezer STOPPED (1-core box).
# Usage: DEADLINE_EPOCH=<epoch> bash scripts/tpu_window_r5.sh
set -u
cd /root/repo
export PDEBENCH_TPU_COMPILE_CACHE=/root/repo/.jax_compile_cache
export PDEBENCH_TPU_WARM_REPEATS=3

BREACH_IDS="$(cat /tmp/breach_ids.txt 2>/dev/null || true)"

while true; do
  if [ "$(date +%s)" -ge "${DEADLINE_EPOCH:?set DEADLINE_EPOCH}" ]; then
    echo "deadline reached" | tee -a results/tpu_sweep_r5.log
    break
  fi
  # shellcheck disable=SC2086
  python scripts/tpu_sweep.py \
    --per-combo 2 --ids-first \
    --resume-jsonl results/tpu_sweep_r5_final.jsonl \
    --ids ${BREACH_IDS} \
    --deadline-epoch "${DEADLINE_EPOCH}" \
    --sentinel-every 20 \
    2>&1 | tee -a results/tpu_sweep_r5.log
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 17 ]; then
    break
  fi
  echo "worker crash; waiting 60s for service recovery" \
    | tee -a results/tpu_sweep_r5.log
  sleep 60
done

python scripts/sweep_summary.py results/tpu_sweep_r5_final.jsonl \
  | tee results/tpu_sweep_r5_report.txt
