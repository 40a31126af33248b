#!/bin/bash
# Round-4 chip phase 2: short jobs (VERDICT items 3/4/5/9) then the FULL
# PRO grid at reference protocol (VERDICT item 1). Serialized TPU work;
# resume-safe via ledgers + fleet checkpoints; wedge-restart loops per the
# verify-skill runbook, with every python client registered for the stall
# killer (run_tpu).
cd "$(dirname "$0")/.."
source scripts/r4_tpu_lib.sh

# Inherit the 12 PRO_HEADLINE cells already run at reference protocol
# (results/pro_ref/sweep_PRO_HEADLINE.jsonl, round 3): same code path
# (sequential driver), same overrides (epochs 1000, batch 256), same
# seed-43 datasets (datagen is bit-deterministic across machine resets —
# round-3 evidence), identical config_ids. Copy once, idempotently.
python - <<'EOF'
import json
from pathlib import Path
src = Path("results/pro_ref/sweep_PRO_HEADLINE.jsonl")
dst = Path("results/pro_ref/sweep_PRO.jsonl")
have = set()
if dst.exists():
    have = {json.loads(l)["config_id"] for l in dst.read_text().splitlines()}
n = 0
if src.exists():
    with open(dst, "a") as f:
        for line in src.read_text().splitlines():
            rec = json.loads(line)
            if rec["config_id"] not in have:
                rec["inherited_from"] = "sweep_PRO_HEADLINE.jsonl"
                f.write(json.dumps(rec) + "\n")
                have.add(rec["config_id"])
                n += 1
print(f"inherited {n} PRO_HEADLINE rows into sweep_PRO.jsonl")
EOF

# Short jobs FIRST (~1.5 h total, all resume-safe): the PRO grid then takes
# whatever chip time the round has left — its ledger granularity makes a
# tail cutoff lose the least information (SEGNO-charged cells run last and
# were protocol-insensitive in round 3).
for attempt in 1 2 3; do
  echo "=== phase 3 short jobs (attempt $attempt, $(date)) ==="
  if run_tpu python scripts/r4_phase3.py; then break; fi
  echo "phase 3 died (attempt $attempt); 680 s hold, then probe"
  sleep 680
  probe || exit 1
done

for attempt in 1 2 3 4 5 6 7 8 9 10 11 12; do
  echo "=== PRO grid @ reference protocol (attempt $attempt, $(date)) ==="
  if run_tpu python -m nonode_tpu.parallel.sweep --grid PRO --use_fleet \
      --schedule scripts/pro_ref_schedule.yaml \
      --data_dir data --outf results/pro_ref --epochs 1000 --batch_size 256; then
    echo "=== phase 2 done ($(date)) ==="
    exit 0
  fi
  echo "sweep died (attempt $attempt); 680 s hold, then probe, then resume"
  sleep 680
  probe || exit 1
done
echo "phase 2 exhausted restart attempts"; exit 1
