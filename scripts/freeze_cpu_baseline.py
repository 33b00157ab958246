#!/usr/bin/env python3
"""Freeze the per-case CPU-direct baseline table (BASELINE.md contract).

The reference derives its time gate from the DOLFINx CPU oracle's
baseline_time measured on the evaluating machine (reference:
scripts/run_benchmark.py:510-517). DOLFINx is not installed in this
image, so the frozen stand-in is this repo's own host-CPU sparse-direct
path (PDEBENCH_TPU_FORCE_DIRECT=1: scipy CSR + SuperLU — the same
UMFPACK-class direct solve the reference's forced-direct cases use).
One record per case: {case_id, t_cpu, err, num_dofs}. Resumable.

MUST run with the machine otherwise idle: t_cpu is wall-clock and this
box has one core (CLAUDE.md).
"""

import argparse
import json
import os
import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset",
                    default="/root/reference/data/benchmark_v2.jsonl")
    ap.add_argument("--resume-jsonl",
                    default="results/cpu_baseline_times.jsonl")
    ap.add_argument("--equation-types", nargs="*", default=None)
    ap.add_argument("--timeout", type=float, default=900.0,
                    help="per-case soft budget; record and move on")
    ap.add_argument("--order-file", default=None,
                    help="file with one case_id per line; run listed cases "
                         "first in that order (cheap-first banks more "
                         "records under a deadline), unlisted ones after")
    ap.add_argument("--refreeze-below-s", type=float, default=None,
                    help="re-run existing ok records with t_cpu below this "
                         "(round-5 cache-bias correction: records frozen "
                         "before per-case cache clearing rode warm sibling "
                         "geometry/sympy caches; last record per case wins "
                         "at read time)")
    ap.add_argument("--deadline-epoch", type=float, default=None,
                    help="stop starting new cases after this unix time")
    args = ap.parse_args()

    os.environ["PDEBENCH_TPU_FORCE_DIRECT"] = "1"
    os.environ.setdefault("PDEBENCH_TPU_PLATFORM", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from pdebench_tpu.oracle import OracleSolver
    from pdebench_tpu.oracle import base as obase

    cases = [json.loads(l) for l in open(args.dataset)]
    if args.equation_types:
        cases = [c for c in cases
                 if c["oracle_config"]["pde"]["type"] in args.equation_types]

    out = Path(args.resume_jsonl)
    out.parent.mkdir(parents=True, exist_ok=True)
    done = set()
    if out.exists():
        for line in out.open():
            try:
                r = json.loads(line)
                if (
                    args.refreeze_below_s is not None
                    and r.get("ok")
                    and not r.get("cold_caches")
                    and float(r.get("t_cpu", 1e18)) < args.refreeze_below_s
                ):
                    continue  # biased-era record: re-run it (last wins)
                done.add(r["case_id"])
            except Exception:
                pass
    todo = [c for c in cases if c["id"] not in done]
    if args.order_file:
        order = [l.strip() for l in open(args.order_file) if l.strip()]
        rank = {cid: i for i, cid in enumerate(order)}
        todo.sort(key=lambda c: rank.get(c["id"], len(rank)))
    print(f"{len(cases)} cases, {len(done)} frozen, {len(todo)} to run",
          flush=True)

    solver = OracleSolver()
    for i, case in enumerate(todo):
        if args.deadline_epoch and time.time() > args.deadline_epoch:
            print("deadline reached; stopping", flush=True)
            break
        rec = {"case_id": case["id"],
               "pde": case["oracle_config"]["pde"]["type"],
               "cold_caches": True}
        # single-cold-solve really means cold: without this, only the
        # FIRST case per (domain, exprs) in a freezer segment paid the
        # distmesh/sympy build and every sibling record undercharged
        # setup 2-7x (poisson_star_5pt_sinsin froze at 0.57 s where a
        # fresh-process cold solve measures 4.29 s) — the exact
        # asymmetry ADVICE r3 flagged on the TPU side, mirrored.
        obase.clear_setup_caches()
        t0 = time.perf_counter()
        try:
            r = solver.solve(case["oracle_config"])
            rec.update(t_cpu=round(time.perf_counter() - t0, 4),
                       err=float(r.baseline_error),
                       num_dofs=int(r.num_dofs), ok=True)
        except Exception as e:
            rec.update(t_cpu=round(time.perf_counter() - t0, 4), ok=False,
                       error=f"{type(e).__name__}: {e}",
                       tb=traceback.format_exc()[-500:])
        with out.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[{i+1}/{len(todo)}] {case['id']:<50s} "
              f"t_cpu={rec['t_cpu']:.2f}s ok={rec['ok']}", flush=True)


if __name__ == "__main__":
    main()
