#!/bin/bash
# One-shot: re-measure the 18 rd_* sweep records that were timed while
# the stale CPU-baseline freezer ran concurrently (16:50-17:50 UTC
# 2026-08-19; CLAUDE.md forbids concurrent timing work — wall-clock t
# was inflated up to ~2x). Drops those records from the resume jsonl
# and re-runs just them on a quiet box. Run AFTER the main sweep exits.
set -eu
REPO=/root/repo
cd "$REPO"
export PDEBENCH_TPU_PLATFORM=cpu
export PDEBENCH_TPU_COMPILE_CACHE=$REPO/.jax_compile_cache
export XLA_FLAGS=--xla_disable_hlo_passes=constant_folding

CASES="rd_annulus_cubic rd_circle_allencahn rd_circle_cubic rd_circle_logistic \
rd_eccentric_allencahn rd_eccentric_logistic_v2 rd_gear_10teeth_linear \
rd_gear_6teeth_logistic rd_multihole_2_cubic rd_multihole_4_linear \
rd_sector_120_logistic rd_sector_half_cubic rd_sector_quarter_linear \
rd_sector_sixty_allencahn rd_star_5_linear rd_star_6_cubic \
rd_star_7_allencahn rd_star_8_logistic"

python - "$CASES" <<'EOF'
import json, sys
cases = set(sys.argv[1].split())
path = "results/oracle_sweep_progress.jsonl"
recs = [json.loads(l) for l in open(path)]
keep = [r for r in recs if r.get("case_id") not in cases]
print(f"dropping {len(recs) - len(keep)} contended records of {len(recs)}")
with open(path, "w") as f:
    for r in keep:
        f.write(json.dumps(r) + "\n")
EOF

nice -n 10 python scripts/test_oracle_cases.py \
  --resume-jsonl results/oracle_sweep_progress.jsonl \
  --cases $CASES 2>&1 | tee -a results/rescrub_r2.log
