#!/bin/bash
# Round-4 TPU validation window (VERDICT r3 #2): run with the freezer
# STOPPED (1-core box; concurrent host work corrupts both sides).
# Usage: DEADLINE_EPOCH=<epoch> bash scripts/tpu_window_r4.sh
# The sweep exits 17 when a case crashes the remote TPU worker (the
# in-process jax client is poisoned); this wrapper restarts a fresh
# process — the crash-trigger case is recorded and skipped on resume.
set -u
cd /root/repo
export PDEBENCH_TPU_COMPILE_CACHE=/root/repo/.jax_compile_cache
export PDEBENCH_TPU_WARM_REPEATS=3

while true; do
  if [ "$(date +%s)" -ge "${DEADLINE_EPOCH:?set DEADLINE_EPOCH}" ]; then
    echo "deadline reached" | tee -a results/tpu_sweep_r4.log
    break
  fi
  python scripts/tpu_sweep.py \
    --per-combo 2 --ids-first \
    --ids stokes_3d_multifreq heat_3d_kappa_contrast \
          cd_3d_transient_supg le_3d_high_contrast \
          poisson_3d_multi_freq biharmonic_circle_test_v2 \
    --deadline-epoch "${DEADLINE_EPOCH}" \
    2>&1 | tee -a results/tpu_sweep_r4.log
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 17 ]; then
    break
  fi
  echo "worker crash; waiting 60s for service recovery" \
    | tee -a results/tpu_sweep_r4.log
  sleep 60
done

python scripts/report_tpu_sweep.py | tee results/tpu_sweep_r4_report.txt
