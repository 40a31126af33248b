#!/bin/bash
# Round-4 tail chip job: regenerate the 12 round-3 inherited PRO_HEADLINE
# cells in-place once the main PRO sweep chain is done.
#
# Why: the round-3 PRO_HEADLINE run kept only its ledger
# (results/pro_ref/sweep_PRO_HEADLINE.jsonl) — the rollout artifacts were
# lost with that round's scratch outf, so the 4 SEGNO headline groups are
# the only reference-protocol cells whose loss@20f / finite@20f companions
# (analysis/ledger.py join) come up NaN. The cells are cheap (30-205 s
# each, early stop at 75-465 epochs). Dropping the inherited rows from
# sweep_PRO.jsonl (provenance stays in the committed HEADLINE ledger) and
# resuming the sweep re-runs exactly those cells through the sequential
# driver, which writes the npz artifacts next to every other cell's.
#
# Starts only after BOTH: the r4_watcher -> phase-2 chain has fully exited
# (no competing TPU client) AND the ledger holds all 96 cells. If phase 2
# died short of 96 rows, this job exits without touching the ledger — the
# inherited rows are then still the best available data for those groups.
cd "$(dirname "$0")/.."
source scripts/r4_tpu_lib.sh

LEDGER=results/pro_ref/sweep_PRO.jsonl

while [ -f /tmp/r4_watcher.pid ] && kill -0 "$(cat /tmp/r4_watcher.pid)" 2>/dev/null; do
  sleep 120
done

rows=$(wc -l < "$LEDGER")
if [ "$rows" -lt 96 ]; then
  echo "tail: watcher chain exited with only $rows/96 rows; leaving inherited rows in place"
  exit 1
fi

python - <<'EOF'
import json
from pathlib import Path
p = Path("results/pro_ref/sweep_PRO.jsonl")
rows = [json.loads(l) for l in p.read_text().splitlines()]
keep = [r for r in rows if "inherited_from" not in r]
dropped = len(rows) - len(keep)
p.write_text("".join(json.dumps(r) + "\n" for r in keep))
print(f"tail: dropped {dropped} inherited rows ({len(keep)} remain)")
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
