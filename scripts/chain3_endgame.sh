#!/bin/bash
# Round-2-resumed endgame: wait for BOTH sweeps (pids passed as $1 $2),
# then (a) run the quiet-box TPU suite probe, (b) run
# freeze_cpu_baseline on the now-quiet box until DEADLINE_EPOCH, then
# stop everything so the round-end driver bench runs quiet.
set -u
P1=${1:?v2 sweep pid}
P2=${2:?v1 sweep pid}
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH}
REPO=/root/repo
WT=$REPO/.sweep_wt
for P in "$P1" "$P2"; do
  while kill -0 "$P" 2>/dev/null; do
    if [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; then
      kill "$P" 2>/dev/null
      sleep 5
      exit 0
    fi
    sleep 30
  done
done
NOW=$(date +%s)
BUDGET=$((DEADLINE_EPOCH - NOW))
[ "$BUDGET" -le 120 ] && exit 0
# (a) quiet TPU bench probe (~15 min)
PYTHONPATH=$REPO:/root/.axon_site \
PDEBENCH_TPU_COMPILE_CACHE=$REPO/.jax_compile_cache \
  timeout 2400 python $REPO/scripts/bench_tpu_only.py \
  > $REPO/results/bench_tpu_quiet_r2.jsonl 2>/dev/null
# (b) clean freeze run on the quiet box
NOW=$(date +%s)
BUDGET=$((DEADLINE_EPOCH - NOW))
[ "$BUDGET" -le 60 ] && exit 0
cd "$WT"
export PDEBENCH_TPU_PLATFORM=cpu
export PDEBENCH_TPU_COMPILE_CACHE=$REPO/.jax_compile_cache
export XLA_FLAGS=--xla_disable_hlo_passes=constant_folding
exec timeout "$BUDGET" nice -n 10 python scripts/freeze_cpu_baseline.py \
  --resume-jsonl "$REPO/results/cpu_baseline_times.jsonl" \
  >> "$REPO/results/freeze_baseline_r2.log" 2>&1
