#!/usr/bin/env python3
"""NS device-Newton phase breakdown on TPU (attack (a) scoping).

Runs navier_stokes_basic warm under the requested env toggles and
prints phase wall-clock + Krylov iteration counts, so the per-iteration
cost of the saddle FGMRES can be compared between M variants.

Usage: python scripts/ns_phase_ab.py [--device-newton] [--repeats N]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="navier_stokes_basic")
    ap.add_argument("--device-newton", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    if args.device_newton:
        os.environ["PDEBENCH_TPU_NS_DEVICE_NEWTON"] = "1"
    os.environ.setdefault("PDEBENCH_TPU_WARM_REPEATS", "3")

    import jax

    jax.config.update("jax_enable_x64", True)
    cache = REPO / ".jax_compile_cache"
    if cache.is_dir():
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pdebench_tpu.oracle import OracleSolver

    cases = [json.loads(l) for l in open("/root/reference/data/benchmark_v2.jsonl")]
    case = next(c for c in cases if c["id"] == args.case)

    s = OracleSolver()
    for i in range(args.repeats):
        t0 = time.perf_counter()
        r = s.solve(case["oracle_config"])
        wall = time.perf_counter() - t0
        info = r.solver_info
        kry = info.get("kry_its", 0)
        t_lin = info.get("t_lin", 0.0)
        per_it = (t_lin / kry * 1e3) if kry else float("nan")
        print(
            f"run {i}: wall={wall:.2f}s baseline_time={r.baseline_time:.3f}s "
            f"t_setup={info.get('t_setup', 0):.3f} t_lin={t_lin:.3f} "
            f"t_init={info.get('t_init', 0):.3f} t_cold={info.get('t_cold', 0):.1f} "
            f"kry_its={kry} per_it={per_it:.3f}ms "
            f"newton_its={info.get('iterations')} err={r.baseline_error:.4e} "
            f"device={info.get('device_newton')}",
            flush=True,
        )


if __name__ == "__main__":
    main()
