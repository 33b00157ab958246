#!/usr/bin/env python
"""TPU-side-only bench probe: bench.py's case suite WITHOUT the CPU
direct proxy. Use for quick A/B timing during development — the CPU
proxy is slow (full direct solves on the 1-core host) and irrelevant
when comparing two TPU configurations. The official round metric
remains bench.py (driver-run, quiet box).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
         PDEBENCH_TPU_COMPILE_CACHE=... python scripts/bench_tpu_only.py
"""
import json
import os
import sys

os.environ.setdefault("PDEBENCH_TPU_WARM_REPEATS", "3")
import jax

jax.config.update("jax_enable_x64", True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench
from pdebench_tpu.oracle import OracleSolver

suite = bench._suite()
solver = OracleSolver()
out = []
for case in suite:
    oc = case["oracle_config"]
    try:
        r = solver.solve(oc)
        rec = {
            "id": case["id"],
            "t": round(r.baseline_time, 3),
            "err": float(r.baseline_error),
            "t_cold": r.solver_info.get("t_cold"),
            "t_setup": round(r.solver_info.get("t_setup", 0.0), 3),
            "its": r.solver_info.get("iterations"),
        }
    except Exception as e:  # keep probing the rest of the suite
        rec = {"id": case["id"], "error": f"{type(e).__name__}: {e}"}
    out.append(rec)
    print(json.dumps(rec), flush=True)
ts = [r["t"] for r in out if "t" in r]
print(json.dumps({"mean": round(sum(ts) / len(ts), 3), "n": len(ts)}), flush=True)
