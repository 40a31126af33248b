#!/bin/bash
# Round-4 chip-job chain: wait for phase 1 (egno-charged-20 BASE regen +
# dataset regeneration), restart it on a wedge death (resume-safe: datagen
# skips existing files, the sweep ledger skips completed cells), then launch
# phase 2 (PRO grid @ reference protocol). One TPU client at a time.
cd "$(dirname "$0")/.."

phase1_done () {
  [ -f results/base_ref/sweep_BASE.jsonl ] || return 1
  rows=$(wc -l < results/base_ref/sweep_BASE.jsonl)
  [ "$rows" -ge 60 ] && [ -f data/loc_train_gravity20_initvel1small.npy ]
}

# wait for the currently-running phase 1
if [ -f /tmp/r4_phase1.pid ]; then
  while kill -0 "$(cat /tmp/r4_phase1.pid)" 2>/dev/null; do sleep 60; done
fi

attempt=0
while ! phase1_done; do
  attempt=$((attempt + 1))
  if [ "$attempt" -gt 6 ]; then
    echo "phase 1 exhausted restart attempts" >> /tmp/r4_phase1.log
    exit 1
  fi
  echo "=== watcher: phase 1 incomplete, restart $attempt after 680 s hold ($(date)) ===" >> /tmp/r4_phase1.log
  sleep 680
  bash scripts/r4_chip_phase1.sh >> /tmp/r4_phase1.log 2>&1
done

echo "=== watcher: phase 1 complete, launching phase 2 ($(date)) ===" >> /tmp/r4_phase1.log
bash scripts/r4_chip_phase2.sh > /tmp/r4_phase2.log 2>&1
