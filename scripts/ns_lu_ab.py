#!/usr/bin/env python3
"""NS host-LU attack A/Bs (VERDICT r3 #4 / PLAN_r4 #3).

The NS bench default is ~0.4 s device Stokes init + ~1.4 s of two host
SuperLU factorizations on the 1-core box. Measures, cheapest first:
  (a) phase decomposition of the default route (where do the seconds
      go: t_init / t_lin / residual evals) + Newton/LU counts,
  (b) splu fill-reducing ordering: COLAMD (scipy default) vs
      MMD_AT_PLUS_A (symmetric-pattern saddle Jacobians) via
      PDEBENCH_TPU_SPLU_PERMC,
  (c) whole-device Newton re-measure post lattice-layout
      (PDEBENCH_TPU_NS_DEVICE_NEWTON=1).

MUST run with the box otherwise idle (wall-clock timing). Alternates
arms to cancel cache-order bias (CLAUDE.md round-3 gotcha).
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _dataset_path() -> Path:
    # repo-first, reference-fallback — same resolution as bench._suite()
    # so the A/B measures the same case records as the official bench
    path = REPO / "data" / "benchmark_v2.jsonl"
    if not path.exists():
        path = Path("/root/reference/data/benchmark_v2.jsonl")
    return path


def bench_case():
    for line in open(_dataset_path()):
        c = json.loads(line)
        if c["oracle_config"]["pde"]["type"] == "navier_stokes":
            oc = c["oracle_config"]
            if (
                oc["domain"]["type"] == "unit_square"
                and "manufactured_solution" in oc["pde"]
            ):
                return c
    raise RuntimeError("no NS bench case")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", nargs="*",
                    default=["default", "permc", "step2", "device"])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="results/ns_lu_ab.jsonl")
    args = ap.parse_args()

    os.environ.setdefault("PDEBENCH_TPU_WARM_REPEATS", "3")
    import jax

    jax.config.update("jax_enable_x64", True)
    from pdebench_tpu.oracle import OracleSolver
    from pdebench_tpu.oracle import base as obase

    case = bench_case()
    oc = case["oracle_config"]
    print(f"case: {case['id']}", flush=True)
    S = OracleSolver()

    env_by_arm = {
        "default": {},
        "permc": {"PDEBENCH_TPU_SPLU_PERMC": "MMD_AT_PLUS_A"},
        "step2": {"PDEBENCH_TPU_NS_DEVICE_STEP2": "1"},
        "step2_permc": {"PDEBENCH_TPU_NS_DEVICE_STEP2": "1",
                        "PDEBENCH_TPU_SPLU_PERMC": "MMD_AT_PLUS_A"},
        "device": {"PDEBENCH_TPU_NS_DEVICE_NEWTON": "1"},
    }
    keys = sorted({k for e in env_by_arm.values() for k in e})
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    # one throwaway solve to warm compiles/caches for every arm equally
    S.solve(oc)
    for rep in range(args.reps):
        for arm in args.arms:  # alternate arms each rep
            for k in keys:
                os.environ.pop(k, None)
            os.environ.update(env_by_arm[arm])
            obase.clear_setup_caches()
            t0 = time.perf_counter()
            r = S.solve(oc)
            wall = time.perf_counter() - t0
            si = r.solver_info
            rec = {
                "arm": arm, "rep": rep,
                "baseline_time": round(float(r.baseline_time), 4),
                "wall": round(wall, 2),
                "err": float(r.baseline_error),
                "t_setup": round(float(si.get("t_setup", 0)), 4),
                "t_init": si.get("t_init"),
                "t_lin": si.get("t_lin"),
                "kry_its": si.get("kry_its"),
                "newton_its": si.get("newton_iterations",
                                     si.get("iterations")),
            }
            with out.open("a") as f:
                f.write(json.dumps(rec) + "\n")
            print(rec, flush=True)
    for k in keys:
        os.environ.pop(k, None)


if __name__ == "__main__":
    main()
