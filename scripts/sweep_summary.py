#!/usr/bin/env python3
"""Summarize TPU sweep files against the (current) frozen CPU table.

vs_cpu stored inside sweep records is the ratio AT MEASUREMENT TIME;
the frozen table may have been re-frozen since (round-5 cache-bias
correction, BASELINE.md #28), so this tool recomputes every ratio from
the latest frozen values (last record per case wins — the same
resolution bench.py and tpu_sweep.py use).

Usage: python scripts/sweep_summary.py results/tpu_sweep_r5.jsonl \
           results/tpu_remeasure_r5b.jsonl ...
Later files override earlier ones per case (re-measures supersede).
"""

import json
import statistics
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def load_frozen():
    frozen = {}
    for line in (REPO / "results" / "cpu_baseline_times.jsonl").open():
        try:
            r = json.loads(line)
            if r.get("ok"):
                frozen[r["case_id"]] = float(r["t_cpu"])
        except Exception:
            continue
    return frozen


def main():
    files = sys.argv[1:] or ["results/tpu_sweep_r5.jsonl"]
    frozen = load_frozen()
    best = {}
    fails = {}
    for fp in files:
        for line in Path(fp).open():
            try:
                r = json.loads(line)
            except Exception:
                continue
            cid = r.get("case_id", "")
            if cid.startswith("__sentinel"):
                continue
            if r.get("ok"):
                best[cid] = r
                fails.pop(cid, None)
            elif cid not in best:
                fails[cid] = r
    rows = []
    for cid, r in best.items():
        t_cpu = frozen.get(cid)
        ratio = (t_cpu / r["t_tpu"]) if t_cpu and r.get("t_tpu") else None
        rows.append((cid, r, t_cpu, ratio))
    ratios = [x[3] for x in rows if x[3]]
    wins = [x for x in rows if x[3] and x[3] >= 1.0]
    breaches = sorted(
        (x for x in rows if x[3] and x[3] < 1.0), key=lambda x: x[3]
    )
    print(f"ok cases: {len(rows)}  with-frozen: {len(ratios)}  "
          f">=1x: {len(wins)}  breaches: {len(breaches)}  "
          f"failures: {len(fails)}")
    if ratios:
        print(f"ratio median {statistics.median(ratios):.2f}x  "
              f"mean {statistics.fmean(ratios):.2f}x  "
              f"max {max(ratios):.1f}x  min {min(ratios):.3f}x")
    for cid, r, t_cpu, ratio in breaches:
        print(f"  BREACH {cid:<42s} t_tpu={r['t_tpu']:8.2f} "
              f"t_setup={r.get('t_setup', 0):6.2f} t_cpu={t_cpu:8.2f} "
              f"-> {ratio:.3f}x")
    for cid, r in fails.items():
        print(f"  FAIL {cid}: {str(r.get('error'))[:120]}")


if __name__ == "__main__":
    main()
