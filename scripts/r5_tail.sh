#!/bin/bash
# Round-5 tail chain, launched after the ~03:00 tunnel outage killed
# r5_chain.sh in its phase-3 probe loop. Reordered for what fits in the
# remaining round: (1) keep probing until the chip returns (each probe()
# call internally retries 5x with 680 s holds); (2) secure the cheap
# deliverable first — a fresh bench headline carrying the bf16_* keys
# (~10-20 min); (3) drain the resumable c20 quality ledger until done or
# the round ends, committing rows incrementally (git add -f: results/ is
# wholesale-gitignored).
# PRECONDITION: r5_chain.sh has exited (never two TPU clients).
cd "$(dirname "$0")/.."
source scripts/r4_tpu_lib.sh

up=0
for cycle in 1 2 3 4 5 6 7 8; do
  echo "=== tail: probe cycle $cycle ($(date)) ==="
  if probe; then up=1; break; fi
done
[ "$up" = 1 ] || { echo "tail: chip never returned"; exit 1; }

echo "=== tail: fresh bench headline ($(date)) ==="
if timeout 1800 python bench.py; then
  git add -f results/bench_headline.json && \
    git commit -q -m "bench: fresh headline with bf16 operating-point keys" || true
else
  echo "tail: bench failed/wedged; 680 s hold before c20"
  sleep 680
  probe || exit 1
fi

LEDGER=results/bf16_quality/ledger_c20.jsonl
last_rows=-1
for attempt in $(seq 1 12); do
  rows=$(wc -l < "$LEDGER" 2>/dev/null || echo 0)
  if [ "$rows" -ge 6 ]; then
    echo "=== tail: c20 ledger complete ($rows rows, $(date)) ==="
    break
  fi
  if [ "$rows" -gt "$last_rows" ] && [ "$rows" -gt 0 ]; then
    git add -f "$LEDGER" && \
      git commit -q -m "bf16 shape gap: c20 protocol rows ($rows/6)" || true
  fi
  last_rows=$rows
  echo "=== tail: c20 quality (attempt $attempt, $rows/6 rows, $(date)) ==="
  if run_tpu python scripts/r5_c20_quality.py; then
    continue
  fi
  echo "tail: c20 runner died (attempt $attempt); 680 s hold, then probe"
  sleep 680
  probe || exit 1
done
rows=$(wc -l < "$LEDGER" 2>/dev/null || echo 0)
[ "$rows" -gt 0 ] && git add -f "$LEDGER" && \
  git commit -q -m "bf16 shape gap: c20 protocol rows ($rows/6)" || true
echo "=== tail chain done ($(date)) ==="
