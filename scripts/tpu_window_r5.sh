#!/bin/bash
# Round-5 TPU validation window (VERDICT r4 #3): run with the freezer
# STOPPED (1-core box; concurrent host work corrupts both sides).
# Usage: DEADLINE_EPOCH=<epoch> bash scripts/tpu_window_r5.sh
#
# Fresh r5 resume file: round 5 changed the measured code (affine-GEMM
# assembly, preonly/lu reroute, faster distmesh) AND the protocol
# (clear_setup_caches now drops the distmesh lru, so t_setup charges
# the mesh build cold like the frozen CPU side) — r4 records are not
# protocol-comparable and stay in results/tpu_sweep_r4.jsonl.
#
# The sweep exits 17 when a case crashes the remote TPU worker (the
# in-process jax client is poisoned); this wrapper restarts a fresh
# process — the crash-trigger case is recorded and skipped on resume.
# The four r4 hard-failure cases are attempted in ISOLATION first (one
# process each) so their dispositions cannot poison the bulk window.
set -u
cd /root/repo
export PDEBENCH_TPU_COMPILE_CACHE=/root/repo/.jax_compile_cache
export PDEBENCH_TPU_WARM_REPEATS=3
LOG=results/tpu_sweep_r5.log

while true; do
  if [ "$(date +%s)" -ge "${DEADLINE_EPOCH:?set DEADLINE_EPOCH}" ]; then
    echo "deadline reached" | tee -a "$LOG"
    break
  fi
  python scripts/tpu_sweep.py \
    --resume-jsonl results/tpu_sweep_r5.jsonl \
    --per-combo 2 \
    --ids helmholtz_3d_k6_high stokes_3d_multifreq \
          convdiff_eccentric_annulus_supg poisson_3d_highfreq \
          heat_3d_kappa_contrast cd_3d_transient_supg \
          le_3d_high_contrast poisson_3d_multi_freq \
          biharmonic_circle_test_v2 helmholtz_circle_origin_v2 \
    --deadline-epoch "${DEADLINE_EPOCH}" \
    2>&1 | tee -a "$LOG"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 17 ]; then
    break
  fi
  echo "worker crash; waiting 60s for service recovery" | tee -a "$LOG"
  sleep 60
done

python scripts/report_tpu_sweep.py results/tpu_sweep_r5.jsonl \
  | tee results/tpu_sweep_r5_report.txt
