#!/bin/bash
# Round-5 TPU chain (VERDICT round-4 items 2 and 4), wedge-safe per the
# verify-skill runbook (one TPU client at a time; 680 s holds + probes
# around any death). Phases, each resumable:
#   1. Retrain the 6 reset-wiped EGNO-gravity PRO fleet groups: drop the
#      18 ledger rows whose rollout artifacts are missing, then resume the
#      PRO sweep at the reference protocol until the ledger is back to 96
#      rows WITH artifacts (fills the nan loss@20f/finite@20f groups).
#   2. Regenerate the charged-20 dataset (reset-wiped, needed by phase 3).
#   3. 3-seed EGNO charged-20/B=512 fp32 AND bf16 at the reference
#      protocol (scripts/r5_c20_quality.py) — closes the bf16 shape gap.
cd "$(dirname "$0")/.."
source scripts/r4_tpu_lib.sh

probe || exit 1

gen () {  # sim n_balls — TEST-split guard (see r4_resume.sh)
  if [ ! -f "data/loc_test_${1}${2}_initvel1small.npy" ]; then
    echo "=== datagen $1 n=$2 ($(date +%H:%M:%S)) ==="
    run_tpu python -m nonode_tpu.sim.generate --simulation "$1" --n_balls "$2" \
      --num-train 3000 --num-valid 2000 --num-test 2000 \
      --length 20000 --length_test 52000 --sample-freq 100 \
      --seed 43 --suffix small --outdir data
  fi
}
gen charged 5
gen gravity 5
gen gravity 10
gen charged 10

LEDGER=results/pro_ref/sweep_PRO.jsonl

# Phase 1a: drop rows whose artifacts are missing (atomic; idempotent —
# once retrained rows re-land with artifacts, this drops nothing).
python - <<'EOF'
import json, os, sys
from pathlib import Path
sys.path.insert(0, ".")
from nonode_tpu.analysis.ledger import iter_ledger_artifacts
p = Path("results/pro_ref/sweep_PRO.jsonl")
rows = [json.loads(l) for l in p.read_text().splitlines()]
missing = {r["config_id"] for r, c, art in iter_ledger_artifacts("results/pro_ref")
           if art is None}
keep = [r for r in rows if r["config_id"] not in missing]
print(f"phase1a: dropping {len(rows) - len(keep)} artifact-less rows "
      f"({len(keep)} remain)")
tmp = p.with_suffix(".jsonl.tmp")
tmp.write_text("".join(json.dumps(r) + "\n" for r in keep))
os.replace(tmp, p)
EOF

for attempt in $(seq 1 20); do
  rows=$(wc -l < "$LEDGER" 2>/dev/null || echo 0)
  if [ "$rows" -ge 96 ]; then
    echo "=== phase 1 done: $rows rows ($(date)) ==="
    break
  fi
  echo "=== phase 1: PRO regen (attempt $attempt, $rows/96 rows, $(date)) ==="
  if run_tpu python -m nonode_tpu.parallel.sweep --grid PRO --use_fleet \
      --schedule scripts/pro_ref_schedule.yaml \
      --data_dir data --outf results/pro_ref --epochs 1000 --batch_size 256; then
    continue  # loop re-checks the row count
  fi
  echo "sweep died (attempt $attempt); 680 s hold, then probe, then resume"
  sleep 680
  probe || exit 1
done
rows=$(wc -l < "$LEDGER" 2>/dev/null || echo 0)
[ "$rows" -ge 96 ] || { echo "phase 1 exhausted attempts at $rows/96"; exit 1; }
git add results/pro_ref && git commit -q -m "PRO ledger: retrained EGNO-gravity groups with rollout artifacts" || true

# Phase 2: charged-20 dataset for the bf16 shape-gap runs
gen charged 20

# Phase 3: fp32 + bf16 EGNO charged-20/B=512 at protocol (resumable)
for attempt in 1 2 3 4 5 6; do
  echo "=== phase 3: c20 quality (attempt $attempt, $(date)) ==="
  if run_tpu python scripts/r5_c20_quality.py; then
    echo "=== phase 3 done ($(date)) ==="
    git add results/bf16_quality && git commit -q -m "bf16 shape gap: charged-20/B=512 fp32+bf16 protocol runs" || true
    exit 0
  fi
  echo "c20 runner died (attempt $attempt); 680 s hold, then probe"
  sleep 680
  probe || exit 1
done
echo "phase 3 exhausted attempts"; exit 1
