#!/bin/bash
# Round-5 TPU chain (VERDICT round-4 items 2, 3-jax-side, 4, 5), wedge-safe
# per the verify-skill runbook (one TPU client at a time; 680 s holds +
# probes around any death). Phases, each resumable, ordered by the
# verdict's priority ranking:
#   0. Regenerate the reset-wiped gravity-5/10 datasets (seed 43 — the
#      datagen→train pipeline is bit-deterministic, RESULTS.md round 3).
#   1. Retrain the 6 nan-companion EGNO-gravity PRO fleet groups: drop
#      exactly their 18 ledger rows (only while their rollout artifacts
#      are missing), resume the PRO sweep at the reference protocol until
#      the ledger is back to 96 rows WITH artifacts, then snapshot the
#      companions into the committed results/pro_ref/companions.jsonl.
#   2. Parity-anchor jax side: segno/gravity-5/in=2, varDT={T,F} x 5
#      seeds (scripts/parity_pro.py protocol; the torch ref side runs
#      detached on CPU in parallel — scripts/r5_parity_ref.sh).
#   3. Regenerate the charged-20 dataset, then 3-seed EGNO
#      charged-20/B=512 fp32 AND bf16 at the reference protocol
#      (scripts/r5_c20_quality.py) — closes the bf16 shape gap.
#   4. Fresh bench headline (bench.py now records bf16_samples_per_s /
#      bf16_mfu context keys; the committed cache predates them, so a
#      busy-chip replay at round end would otherwise drop the validated
#      speed mode from BENCH_r05).
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
gen gravity 5
gen gravity 10

LEDGER=results/pro_ref/sweep_PRO.jsonl

# Phase 1a: drop ONLY the 6 published-nan groups' rows, and only while
# their artifacts are missing (idempotent: after retraining re-lands the
# rows with artifacts, this drops nothing; after yet another reset it
# correctly re-queues the same 6 groups). The other 78 rows' artifacts
# were also reset-wiped, but their companions are snapshotted in the
# committed companions.jsonl — do NOT drop them (that would retrain the
# whole grid, ~35 h).
python - <<'EOF'
import json, os, sys
from pathlib import Path
sys.path.insert(0, ".")
from nonode_tpu.analysis.ledger import iter_ledger_artifacts
NAN_GROUPS = {("egno", "gravity", 5, 2, True), ("egno", "gravity", 5, 2, False),
              ("egno", "gravity", 10, 2, True), ("egno", "gravity", 10, 2, False),
              ("egno", "gravity", 10, 3, True), ("egno", "gravity", 10, 3, False)}
p = Path("results/pro_ref/sweep_PRO.jsonl")
rows = [json.loads(l) for l in p.read_text().splitlines()]
drop = set()
for r, c, art in iter_ledger_artifacts("results/pro_ref"):
    key = (c["model"], c["dataset"], c["n_balls"], c["num_inputs"],
           bool(c["varDT"]))
    if key in NAN_GROUPS and art is None:
        drop.add(r["config_id"])
keep = [r for r in rows if r["config_id"] not in drop]
print(f"phase1a: dropping {len(rows) - len(keep)} artifact-less nan-group "
      f"rows ({len(keep)} remain)")
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
python scripts/companion_snapshot.py results/pro_ref
git add -f results/pro_ref/sweep_PRO.jsonl results/pro_ref/companions.jsonl && git commit -q -m "PRO ledger: retrained nan-companion EGNO-gravity groups; companion snapshot" || true

# Phase 2: parity-anchor jax side (chip-owning; the CPU torch ref side
# runs detached in parallel via scripts/r5_parity_ref.sh). Argv mirrors
# scripts/parity_pro.py ensure_trained exactly, restricted to --sides jax.
for varDT in True False; do
  v=$([ "$varDT" = True ] && echo varT || echo varF)
  for attempt in 1 2 3; do
    echo "=== phase 2: parity jax side $v (attempt $attempt, $(date)) ==="
    if run_tpu python scripts/parity_e2e.py \
        --workdir "results/parity_e2e_pro_$v" --dataset gravity \
        --n_balls 5 --num_inputs 2 --varDT "$varDT" --models segno \
        --epochs 600 --report "PARITY_E2E_pro_$v.md" \
        --ref_seeds 1 2 3 4 5 --jax_seeds 1 2 3 4 5 --sides jax; then
      break
    fi
    echo "parity jax side died (attempt $attempt); 680 s hold, then probe"
    sleep 680
    probe || exit 1
  done
done

# Phase 3: charged-20 dataset + fp32/bf16 EGNO B=512 at protocol (resumable)
gen charged 20
for attempt in 1 2 3 4 5 6; do
  echo "=== phase 3: c20 quality (attempt $attempt, $(date)) ==="
  if run_tpu python scripts/r5_c20_quality.py; then
    echo "=== phase 3 done ($(date)) ==="
    git add -f results/bf16_quality/ledger_c20.jsonl && git commit -q -m "bf16 shape gap: charged-20/B=512 fp32+bf16 protocol runs" || true
    break
  fi
  echo "c20 runner died (attempt $attempt); 680 s hold, then probe"
  sleep 680
  probe || exit 1
done
c20rows=$(wc -l < results/bf16_quality/ledger_c20.jsonl 2>/dev/null || echo 0)
[ "$c20rows" -ge 6 ] || { echo "phase 3 exhausted attempts at $c20rows/6 rows"; exit 1; }

# Phase 4: fresh bench headline with the bf16 keys. NOT via run_tpu —
# bench.py treats any PID in /tmp/r4_tpu_job.pid (including itself) as a
# busy chip and would replay the stale cache.
echo "=== phase 4: fresh bench headline ($(date)) ==="
timeout 1800 python bench.py && \
  git add -f results/bench_headline.json && \
  git commit -q -m "bench: fresh headline with bf16 operating-point keys" || \
  echo "phase 4 bench failed (non-fatal; BENCH_r05 will replay the cache)"
echo "=== chain complete ($(date)) ==="
