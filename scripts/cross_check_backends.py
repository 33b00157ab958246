#!/usr/bin/env python3
"""Independent-backend cross-check over the benchmark dataset.

Validates the native C++ backend (a from-scratch FEM implementation:
own dof numbering, assembly, Krylov, sampling) against the SAME ground
truth the jax backend is swept against, providing the second-
implementation evidence the reference gets from running DOLFINx,
Firedrake and deal.II side by side (reference: scripts/test_oracle_cases.py
plus pdebench/oracle/firedrake_oracle/common.py).

Modes per case:
- MMS cases: solve with the native backend, compare to the exact
  manufactured solution (an independent check — the jax sweep already
  validates its own grids against the same exact solutions).
- --grid-compare: additionally solve with the jax backend and compare
  NaN masks + values grid-to-grid (expensive on CPU; use stratified
  samples).

Resumable: --resume-jsonl appends and skips case_ids already recorded.
"""

import argparse
import json
import sys
import time
import traceback
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SCALAR = {"poisson", "helmholtz", "heat", "darcy", "convection_diffusion",
          "wave", "reaction_diffusion"}
SYSTEM = {"biharmonic", "linear_elasticity", "stokes", "navier_stokes"}
DOMAINS = {"unit_square", "unit_cube", "l_shape", "circle", "annulus",
           "square_with_hole", "multi_hole", "t_junction", "sector",
           "star", "gear", "dumbbell", "eccentric_annulus"}

# MMS acceptance: discretization error at dataset resolutions lands well
# below this; anything above signals a genuine implementation divergence
MMS_GATE = 2e-2


def eligible(case):
    oc = case["oracle_config"]
    return (oc["pde"]["type"] in SCALAR | SYSTEM
            and oc["domain"]["type"] in DOMAINS)


def has_mms(case):
    mms = case["oracle_config"]["pde"].get("manufactured_solution")
    return bool(mms)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="/root/reference/data/benchmark_v2.jsonl")
    ap.add_argument("--resume-jsonl", default="results/cpp_cross_check.jsonl")
    ap.add_argument("--grid-compare", action="store_true",
                    help="also run the jax backend and compare grids")
    ap.add_argument("--per-combo", type=int, default=0,
                    help="stratified: at most N cases per (pde, domain)")
    ap.add_argument("--equation-types", nargs="*", default=None)
    ap.add_argument("--ids", nargs="*", default=None)
    ap.add_argument("--cheap-first", action="store_true",
                    help="order cases cheapest-first (bank records early)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from pdebench_tpu.oracle import OracleSolver

    cases = [json.loads(l) for l in open(args.dataset)]
    cases = [c for c in cases if eligible(c) and has_mms(c)]
    if args.equation_types:
        cases = [c for c in cases
                 if c["oracle_config"]["pde"]["type"] in args.equation_types]
    if args.ids:
        cases = [c for c in cases if c["id"] in args.ids]
    if args.per_combo:
        seen = {}
        keep = []
        for c in cases:
            oc = c["oracle_config"]
            k = (oc["pde"]["type"], oc["domain"]["type"])
            if seen.get(k, 0) < args.per_combo:
                seen[k] = seen.get(k, 0) + 1
                keep.append(c)
        cases = keep

    out = Path(args.resume_jsonl)
    out.parent.mkdir(parents=True, exist_ok=True)
    done = set()
    if out.exists():
        for line in out.open():
            try:
                done.add(json.loads(line)["case_id"])
            except Exception:
                pass
    todo = [c for c in cases if c["id"] not in done]
    if args.cheap_first:
        # bank the fast records first under a deadline: scalar 2-D before
        # systems, low resolution first, wave/3-D monsters last
        expensive = {"wave", "stokes", "navier_stokes", "biharmonic"}

        def cost_key(c):
            oc = c["oracle_config"]
            res = int(oc.get("mesh", {}).get("resolution", 64))
            is3d = oc["domain"]["type"] == "unit_cube"
            return (oc["pde"]["type"] in expensive, is3d, res)

        todo.sort(key=cost_key)
    print(f"{len(cases)} eligible MMS cases, {len(done)} done, "
          f"{len(todo)} to run", flush=True)

    solver = OracleSolver()
    n_ok = n_fail = 0
    for i, case in enumerate(todo):
        cid = case["id"]
        t0 = time.time()
        rec = {"case_id": cid,
               "pde": case["oracle_config"]["pde"]["type"],
               "domain": case["oracle_config"]["domain"]["type"]}
        try:
            r = solver.solve(case["oracle_config"], solver_library="cpp")
            rec.update(ok=bool(r.baseline_error < MMS_GATE),
                       err=float(r.baseline_error),
                       num_dofs=int(r.num_dofs),
                       nan_fraction=float(np.isnan(r.reference).mean()))
            if args.grid_compare:
                rj = solver.solve(case["oracle_config"], solver_library="jax")
                m_c = np.isnan(r.reference)
                m_j = np.isnan(rj.reference)
                both = ~(m_c | m_j)
                denom = np.linalg.norm(rj.reference[both])
                rec["grid_rel_diff"] = float(
                    np.linalg.norm(r.reference[both] - rj.reference[both])
                    / (denom if denom > 0 else 1.0))
                rec["mask_agree"] = float((m_c == m_j).mean())
        except NotImplementedError as e:
            # legitimate scope gate (e.g. native nonlinear reactions):
            # a skip, not a disagreement
            rec.update(ok=True, skipped=True, reason=str(e))
        except Exception as e:
            rec.update(ok=False, error=f"{type(e).__name__}: {e}",
                       tb=traceback.format_exc()[-800:])
        rec["elapsed"] = round(time.time() - t0, 2)
        with out.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        n_ok += rec["ok"]
        n_fail += not rec["ok"]
        msg = (f"err={rec.get('err', float('nan')):.2e}"
               if "err" in rec else rec.get("error", "?")[:60])
        print(f"[{i+1}/{len(todo)}] {'OK ' if rec['ok'] else 'FAIL'} "
              f"{cid:<50s} ({rec['elapsed']}s) {msg}", flush=True)
    print(f"done: {n_ok} ok, {n_fail} fail", flush=True)


if __name__ == "__main__":
    main()
