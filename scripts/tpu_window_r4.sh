#!/bin/bash
# Round-4 TPU validation window (VERDICT r3 #2): run with the freezer
# STOPPED (1-core box; concurrent host work corrupts both sides).
# Usage: DEADLINE_EPOCH=<epoch> bash scripts/tpu_window_r4.sh
set -u
cd /root/repo
export PDEBENCH_TPU_COMPILE_CACHE=/root/repo/.jax_compile_cache
export PDEBENCH_TPU_WARM_REPEATS=3

# hard-suite cases first (bench validation rides the sweep), then the
# 3-D + complex-domain monsters VERDICT asked for, then strata
python scripts/tpu_sweep.py \
  --per-combo 2 --ids-first \
  --ids helmholtz_3d_k5_trig convdiff_eccentric_annulus_supg \
        helmholtz_circle_origin_v2 poisson_3d_highfreq \
        helmholtz_3d_k6_high stokes_3d_multifreq \
        heat_3d_kappa_contrast cd_3d_transient_supg \
        le_3d_high_contrast poisson_3d_multi_freq \
        convdiff_annulus_diag_supg biharmonic_circle_test_v2 \
        burgers_eccentric_v2 wave_eccann_trig \
  --deadline-epoch "${DEADLINE_EPOCH:?set DEADLINE_EPOCH}" \
  2>&1 | tee -a results/tpu_sweep_r4.log

python scripts/report_tpu_sweep.py | tee results/tpu_sweep_r4_report.txt
