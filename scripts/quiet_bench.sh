#!/bin/bash
# Quiet-window TPU bench: SIGSTOP the background sweeps, run the
# TPU-only suite probe (uncontended host), SIGCONT the sweeps.
# Usage: bash scripts/quiet_bench.sh [out.json]
set -u
OUT=${1:-/root/repo/results/bench_tpu_quiet.jsonl}
PIDS=""
for f in /tmp/sweep.pid /tmp/chain.pid; do
  P=$(cat "$f" 2>/dev/null || echo "")
  [ -n "$P" ] && kill -0 "$P" 2>/dev/null && PIDS="$PIDS $P"
done
# also the python children (pid files may point at wrapper shells)
for P in $(pgrep -a python | grep test_oracle_cases | awk '{print $1}'); do
  PIDS="$PIDS $P"
done
echo "stopping:$PIDS"
for P in $PIDS; do kill -STOP "$P" 2>/dev/null; done
trap 'for P in $PIDS; do kill -CONT "$P" 2>/dev/null; done' EXIT
PYTHONPATH=/root/repo:/root/.axon_site \
PDEBENCH_TPU_COMPILE_CACHE=/root/repo/.jax_compile_cache \
  timeout 3600 python /root/repo/scripts/bench_tpu_only.py | tee "$OUT"
