#!/usr/bin/env python
"""NS phase-breakdown probe on the live TPU: run one NS case under the
current env (PDEBENCH_TPU_NS_DEVICE_INIT / _NEWTON toggles) and print
baseline_time plus the solver_info phase clocks (t_init, t_lin,
kry_its). Usage:

  PYTHONPATH=/root/repo:/root/.axon_site \
  PDEBENCH_TPU_COMPILE_CACHE=/root/repo/.jax_compile_cache \
  [PDEBENCH_TPU_NS_DEVICE_NEWTON=1] python scripts/ns_probe.py [case_id]
"""
import json
import os
import sys

os.environ.setdefault("PDEBENCH_TPU_WARM_REPEATS", "3")
import jax

jax.config.update("jax_enable_x64", True)
if os.environ.get("PDEBENCH_TPU_MATMUL_PREC"):
    jax.config.update(
        "jax_default_matmul_precision",
        os.environ["PDEBENCH_TPU_MATMUL_PREC"],
    )
if os.environ.get("PDEBENCH_TPU_COMPILE_CACHE"):
    os.makedirs(os.environ["PDEBENCH_TPU_COMPILE_CACHE"], exist_ok=True)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ["PDEBENCH_TPU_COMPILE_CACHE"],
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

case_id = sys.argv[1] if len(sys.argv) > 1 else "navier_stokes_basic"
case = None
for line in open("data/benchmark_v2.jsonl"):
    c = json.loads(line)
    if c["id"] == case_id:
        case = c
        break
assert case is not None, case_id

from pdebench_tpu.oracle import OracleSolver

r = OracleSolver().solve(case["oracle_config"])
si = r.solver_info
print(
    json.dumps(
        {
            "id": case_id,
            "env_init": os.environ.get("PDEBENCH_TPU_NS_DEVICE_INIT", ""),
            "env_newton": os.environ.get("PDEBENCH_TPU_NS_DEVICE_NEWTON", ""),
            "t": round(r.baseline_time, 3),
            "err": float(r.baseline_error),
            "t_setup": round(si.get("t_setup", 0.0), 3),
            "t_init": si.get("t_init"),
            "t_lin": si.get("t_lin"),
            "kry_its": si.get("kry_its"),
            "iterations": si.get("iterations"),
            "residual": si.get("residual"),
            "t_cold": si.get("t_cold"),
            "device_newton": si.get("device_newton"),
        }
    ),
    flush=True,
)
