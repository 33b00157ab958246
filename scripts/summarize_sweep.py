#!/usr/bin/env python
"""Summarize an oracle-sweep resume JSONL into a markdown report."""
import json
import sys
from collections import defaultdict

path = sys.argv[1] if len(sys.argv) > 1 else "results/oracle_sweep_progress.jsonl"
recs = [json.loads(l) for l in open(path)]
by_type = defaultdict(list)
for r in recs:
    t = r["case_id"].split("_")[0]
    by_type[t].append(r)

n_ok = sum(r["ok"] for r in recs)
print(f"{n_ok}/{len(recs)} cases valid "
      f"({len(recs)} of 645 swept so far; resumable)")
print()
print("| family prefix | cases | ok | median t (s) | max err |")
print("|---|---|---|---|---|")
import statistics
for t, rs in sorted(by_type.items()):
    ts = [r.get("baseline_time", 0) for r in rs if r["ok"]]
    errs = [r.get("baseline_error", 0) for r in rs if r["ok"]]
    print(f"| {t} | {len(rs)} | {sum(r['ok'] for r in rs)} | "
          f"{statistics.median(ts):.2f} | {max(errs):.2e} |" if ts else
          f"| {t} | {len(rs)} | 0 | - | - |")
fails = [r for r in recs if not r["ok"]]
if fails:
    print()
    print("Failures:")
    for r in fails:
        print(f"- {r['case_id']}: {r['message'][:120]}")
