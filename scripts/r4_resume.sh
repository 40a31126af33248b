#!/bin/bash
# SUPERSEDED (round 5): the PRO grid completed and this chain is dead — do
# NOT relaunch (HANDOFF.md). Kept for provenance; the live chain is
# scripts/r5_chain.sh. The ADVICE round-4 items (charged-5 gen, atomic
# ledger rewrite, missing-ledger guard default) are fixed below.
# Round-4 resume chain after a machine restart: probe the chip (wedge-safe
# holds per the verify-skill runbook), then resume the PRO grid at the
# reference protocol from its ledger, then run the tail headline-cell regen.
# Phase-3 short jobs and phase 1 are already complete (committed evidence),
# so this is the remainder of scripts/r4_chip_phase2.sh + r4_chip_tail.sh.
cd "$(dirname "$0")/.."
source scripts/r4_tpu_lib.sh

probe || exit 1

# The machine reset wiped gitignored data/ again — regenerate the PRO-grid
# datasets first (bit-deterministic at seed 43, round-3 evidence; each
# ~1-4 min on chip). PRO needs {charged,gravity} x {5,10}; the 20-ball
# sets are regenerated last, opportunistically, for analysis reruns.
gen () {  # sim n_balls
  # Guard on the TEST split (written last): a run killed mid-datagen leaves
  # the train files behind, and a train-only guard would skip the regen and
  # crash the sweep on the first cell of that dataset. Datagen is
  # bit-deterministic at seed 43, so regenerating all splits is safe.
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
for attempt in $(seq 1 20); do
  echo "=== PRO grid @ reference protocol (resume attempt $attempt, $(date)) ==="
  if run_tpu python -m nonode_tpu.parallel.sweep --grid PRO --use_fleet \
      --schedule scripts/pro_ref_schedule.yaml \
      --data_dir data --outf results/pro_ref --epochs 1000 --batch_size 256; then
    echo "=== PRO grid done: $(wc -l < "$LEDGER") rows ($(date)) ==="
    break
  fi
  echo "sweep died (attempt $attempt); 680 s hold, then probe, then resume"
  sleep 680
  probe || exit 1
done

rows=$(wc -l < "$LEDGER" 2>/dev/null || echo 0)
if [ "$rows" -lt 96 ]; then
  echo "resume chain exiting with only $rows/96 rows"
  exit 1
fi

# Tail: drop the 12 inherited HEADLINE rows and regenerate them through the
# sequential driver so their npz artifacts exist (see r4_chip_tail.sh).
python - <<'EOF'
import json, os
from pathlib import Path
p = Path("results/pro_ref/sweep_PRO.jsonl")
rows = [json.loads(l) for l in p.read_text().splitlines()]
keep = [r for r in rows if "inherited_from" not in r]
print(f"tail: dropped {len(rows) - len(keep)} inherited rows ({len(keep)} remain)")
# atomic replace: a crash mid-write must not truncate the round's primary ledger
tmp = p.with_suffix(".jsonl.tmp")
tmp.write_text("".join(json.dumps(r) + "\n" for r in keep))
os.replace(tmp, p)
EOF

for attempt in 1 2 3 4; do
  echo "=== tail: headline-cell regen (attempt $attempt, $(date)) ==="
  if run_tpu python -m nonode_tpu.parallel.sweep --grid PRO --use_fleet \
      --schedule scripts/pro_ref_schedule.yaml \
      --data_dir data --outf results/pro_ref --epochs 1000 --batch_size 256; then
    echo "=== tail done: $(wc -l < "$LEDGER") rows ($(date)) ==="
    exit 0
  fi
  echo "tail sweep died (attempt $attempt); 680 s hold, then probe"
  sleep 680
  probe || exit 1
done
echo "tail exhausted restart attempts"; exit 1
