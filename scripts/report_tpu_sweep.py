#!/usr/bin/env python3
"""Summarize results/tpu_sweep_r4.jsonl into the BASELINE.md table
(VERDICT r3 #2 deliverable): N cases, error tolerance check, M cases
<= frozen CPU baseline, breach list for adjudication, sentinel drift."""

import json
import sys
from collections import defaultdict
from pathlib import Path

path = Path(sys.argv[1] if len(sys.argv) > 1 else "results/tpu_sweep_r4.jsonl")
recs = [json.loads(l) for l in path.open()]
sentinels = [r for r in recs if r["case_id"].startswith("__sentinel")]
cases = {r["case_id"]: r for r in recs if not r["case_id"].startswith("__sentinel")}
cases = list(cases.values())

ok = [r for r in cases if r.get("ok")]
fail = [r for r in cases if not r.get("ok")]
with_cpu = [r for r in ok if r.get("t_cpu")]
beats = [r for r in with_cpu if r["t_tpu"] <= r["t_cpu"]]
errs = [r["err"] for r in ok]

print(f"cases: {len(cases)} ({len(ok)} ok, {len(fail)} failed)")
if sentinels:
    ss = [s["sentinel_s"] for s in sentinels if s.get("sentinel_s")]
    if ss:
        print(f"sentinel: min {min(ss)}s max {max(ss)}s over {len(ss)} probes")
if errs:
    import numpy as np

    print(f"errors: median {np.median(errs):.2e} max {max(errs):.2e}; "
          f">=5e-2: {sum(e >= 5e-2 for e in errs)}")
print(f"vs frozen CPU: {len(beats)}/{len(with_cpu)} cases <= baseline")
if with_cpu:
    import numpy as np

    sp = [r["t_cpu"] / r["t_tpu"] for r in with_cpu]
    print(f"speedup: median {np.median(sp):.1f}x  p10 {np.percentile(sp,10):.1f}x  "
          f"min {min(sp):.2f}x  max {max(sp):.0f}x")

by = defaultdict(list)
for r in ok:
    by[r["pde"]].append(r)
print("\n| pde | n | med t_tpu | med vs_cpu | max err |")
print("|---|---|---|---|---|")
import numpy as np

for pde, v in sorted(by.items()):
    sp = [r["t_cpu"] / r["t_tpu"] for r in v if r.get("t_cpu")]
    print(f"| {pde} | {len(v)} | {np.median([r['t_tpu'] for r in v]):.2f}s "
          f"| {np.median(sp):.1f}x | {max(r['err'] for r in v):.1e} |"
          if sp else
          f"| {pde} | {len(v)} | {np.median([r['t_tpu'] for r in v]):.2f}s | - | "
          f"{max(r['err'] for r in v):.1e} |")

breaches = [r for r in with_cpu if r["t_tpu"] > r["t_cpu"]]
if breaches:
    print("\nbreaches (t_tpu > frozen CPU):")
    for r in sorted(breaches, key=lambda r: r["t_cpu"] / r["t_tpu"]):
        print(f"  {r['case_id']:<45s} tpu={r['t_tpu']:8.2f}s cpu={r['t_cpu']:8.2f}s "
              f"({r['t_cpu']/r['t_tpu']:.2f}x) dofs={r.get('num_dofs')}")
if fail:
    print("\nfailures:")
    for r in fail:
        print(f"  {r['case_id']:<45s} {r.get('error','?')[:90]}")
