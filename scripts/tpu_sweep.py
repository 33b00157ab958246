#!/usr/bin/env python3
"""Dataset-scale validation sweep ON THE REAL TPU (VERDICT r3 #2).

The 645-case acceptance sweep ran on CPU (correct for error validation);
the rebuild target is "all cases on one TPU v5e chip" (BASELINE.md).
This sweep runs a stratified stratum of benchmark_v2 through the jax
backend on the axon TPU, recording warm errors + warm times per case and
comparing each time against its frozen quiet-box CPU baseline
(results/cpu_baseline_times.jsonl, scripts/freeze_cpu_baseline.py).

Protocol per case (matches bench.py's official protocol):
- setup caches cleared first -> t_setup charged cold, like the frozen
  CPU single-solve protocol (ADVICE r3 medium);
- baseline_time = t_setup + best-of-PDEBENCH_TPU_WARM_REPEATS warm
  execution (compile excluded; t_cold recorded alongside);
- transient axon flakes retried once (tunnel drops, resets).

A fixed-kernel service sentinel (bench._service_sentinel) is recorded
at start and every --sentinel-every cases so axon "weather" drift is
quantifiable in the record.

Resumable: appends to --resume-jsonl, skips recorded case_ids.
Ordering: cheap-first by (pde group, 3-D, resolution), grouping similar
shapes consecutively to maximize jit-cache hits between cases.
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

SCALAR = {"poisson", "helmholtz", "heat", "darcy", "convection_diffusion",
          "wave", "reaction_diffusion"}
SYSTEM = {"biharmonic", "linear_elasticity", "stokes", "navier_stokes",
          "burgers"}


def main():
    ap = argparse.ArgumentParser()
    # repo-first, reference-fallback: same resolution as bench._suite()
    # so the sweep measures the same case records as the official bench
    _default_ds = REPO / "data" / "benchmark_v2.jsonl"
    if not _default_ds.exists():
        _default_ds = Path("/root/reference/data/benchmark_v2.jsonl")
    ap.add_argument("--dataset", default=str(_default_ds))
    ap.add_argument("--resume-jsonl", default="results/tpu_sweep_r4.jsonl")
    ap.add_argument("--frozen-jsonl", default="results/cpu_baseline_times.jsonl")
    ap.add_argument("--per-combo", type=int, default=2,
                    help="stratified: at most N MMS cases per (pde, domain)")
    ap.add_argument("--ids", nargs="*", default=None,
                    help="extra case ids to include regardless of strata")
    ap.add_argument("--ids-first", action="store_true",
                    help="run --ids cases before the strata (guarantees "
                         "the monsters land under a deadline)")
    ap.add_argument("--equation-types", nargs="*", default=None)
    ap.add_argument("--deadline-epoch", type=float, default=None,
                    help="stop starting new cases after this unix time")
    ap.add_argument("--sentinel-every", type=int, default=25)
    ap.add_argument("--max-cases", type=int, default=None)
    args = ap.parse_args()

    os.environ.setdefault("PDEBENCH_TPU_WARM_REPEATS", "3")
    import jax

    jax.config.update("jax_enable_x64", True)
    cache = os.environ.get(
        "PDEBENCH_TPU_COMPILE_CACHE", str(REPO / ".jax_compile_cache"))
    if Path(cache).is_dir():
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench as benchmod  # repo-root bench.py: retry + sentinel helpers
    from pdebench_tpu.oracle import OracleSolver
    from pdebench_tpu.oracle import base as obase

    cases = [json.loads(l) for l in open(args.dataset)]
    by_id = {c["id"]: c for c in cases}

    picked = {}
    seen = {}
    for c in cases:
        oc = c["oracle_config"]
        if not oc["pde"].get("manufactured_solution"):
            continue
        if args.equation_types and oc["pde"]["type"] not in args.equation_types:
            continue
        k = (oc["pde"]["type"], oc["domain"]["type"])
        if seen.get(k, 0) < args.per_combo:
            seen[k] = seen.get(k, 0) + 1
            picked[c["id"]] = c
    for cid in args.ids or []:
        if cid in by_id:
            picked[cid] = by_id[cid]
        else:
            print(f"# unknown id {cid}", file=sys.stderr)

    out = Path(args.resume_jsonl)
    out.parent.mkdir(parents=True, exist_ok=True)
    done = set()
    if out.exists():
        for line in out.open():
            try:
                done.add(json.loads(line)["case_id"])
            except Exception:
                pass

    frozen = {}
    fp = Path(args.frozen_jsonl)
    if fp.exists():
        for line in fp.open():
            try:
                r = json.loads(line)
                if r.get("ok"):
                    frozen[r["case_id"]] = float(r["t_cpu"])
            except Exception:
                continue

    todo = [c for cid, c in picked.items() if cid not in done]

    def cost_key(c):
        oc = c["oracle_config"]
        res = int(oc.get("mesh", {}).get("resolution", 64))
        is3d = oc["domain"]["type"] == "unit_cube"
        heavy = oc["pde"]["type"] in {"wave", "navier_stokes", "burgers",
                                      "biharmonic", "reaction_diffusion"}
        # group (type, domain, res) so consecutive cases share XLA programs
        return (heavy, is3d, res, oc["pde"]["type"], oc["domain"]["type"])

    todo.sort(key=cost_key)
    if args.ids_first and args.ids:
        prio = {cid: i for i, cid in enumerate(args.ids)}
        todo.sort(key=lambda c: prio.get(c["id"], len(prio)))
    if args.max_cases:
        todo = todo[: args.max_cases]
    print(f"{len(picked)} selected, {len(done)} done, {len(todo)} to run",
          flush=True)

    solver = OracleSolver()
    for i, case in enumerate(todo):
        if args.deadline_epoch and time.time() > args.deadline_epoch:
            print("deadline reached; stopping", flush=True)
            break
        if i % max(args.sentinel_every, 1) == 0:
            try:
                s = round(benchmod._service_sentinel(), 4)
            except Exception as e:
                s = None
                print(f"# sentinel failed: {e}", file=sys.stderr)
            with out.open("a") as f:
                f.write(json.dumps({"case_id": f"__sentinel_{i}",
                                    "sentinel_s": s,
                                    "ts": time.time()}) + "\n")
            print(f"# sentinel: {s}s", flush=True)

        oc = case["oracle_config"]
        rec = {"case_id": case["id"], "pde": oc["pde"]["type"],
               "domain": oc["domain"]["type"]}
        obase.clear_setup_caches()
        t0 = time.perf_counter()
        try:
            r = benchmod._solve_with_retry(solver, oc, case["id"])
            # Stall mitigation: the axon tunnel intermittently hangs
            # ONE host->device transfer ~10 s (CLAUDE.md round-3; this
            # window: sibling cases with identical shapes measured
            # t_setup 0.3 s vs 10.4 s). A single sweep pass has no
            # best-of protection on t_setup, so a pathological setup
            # gets one cold re-measure and keeps the better solve.
            if (
                float(r.solver_info.get("t_setup", 0.0)) >= 4.0
                and int(r.num_dofs) < 200_000
            ):
                obase.clear_setup_caches()
                r2 = benchmod._solve_with_retry(solver, oc, case["id"])
                if r2.baseline_time < r.baseline_time:
                    r = r2
            si = r.solver_info or {}
            t_cpu = frozen.get(case["id"])
            rec.update(
                ok=True,
                t_tpu=round(float(r.baseline_time), 4),
                t_wall=round(time.perf_counter() - t0, 2),
                err=float(r.baseline_error),
                num_dofs=int(r.num_dofs),
                t_setup=round(float(si.get("t_setup", 0.0)), 4),
                t_cold=round(float(si.get("t_cold", 0.0)), 4),
                t_cpu=t_cpu,
                vs_cpu=(round(t_cpu / r.baseline_time, 3)
                        if t_cpu and r.baseline_time > 0 else None),
            )
        except Exception as e:
            msg = str(e)
            rec.update(ok=False, t_wall=round(time.perf_counter() - t0, 2),
                       error=f"{type(e).__name__}: {msg[:400]}",
                       tb=traceback.format_exc()[-600:])
            # a crashed TPU worker poisons this process's jax client —
            # every later case would fail UNAVAILABLE in seconds.
            # Record the trigger case (resume skips it: one attempt per
            # crashing case) and exit 17 so the wrapper restarts a
            # fresh process for the remaining cases.
            if "crashed or restarted" in msg or "UNAVAILABLE" in msg:
                rec["crash"] = True
                with out.open("a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(f"backend crashed on {case['id']}; exiting for "
                      f"wrapper restart", flush=True)
                sys.exit(17)
        with out.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        msg = (f"[{i + 1}/{len(todo)}] {case['id']:<45s} ok={rec['ok']} "
               f"t_tpu={rec.get('t_tpu', -1)}s wall={rec['t_wall']}s")
        if rec.get("vs_cpu"):
            msg += f" vs_cpu={rec['vs_cpu']}x"
        print(msg, flush=True)


if __name__ == "__main__":
    main()
