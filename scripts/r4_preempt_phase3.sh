#!/bin/bash
# Round-4 preempt runner: phase-1 (egno-charged-20, an ~8 h fleet under the
# HBM guard) was preempted at its epoch-300 checkpoint because it cannot
# finish in this round's remaining chip time, while the phase-3 short jobs
# (VERDICT round-3 items 3/4/5/9: stretch drift, SEGNO latency, bf16
# trained quality, mocap seed group) can. Stages run quickest-first so a
# tail cutoff loses the least; every stage is ledger-resume-safe.
# Logs to /tmp/r4_phase2.log so the stall killer tracks growth.
cd "$(dirname "$0")/.."
source scripts/r4_tpu_lib.sh

probe || exit 1

for attempt in 1 2 3 4 5 6; do
  echo "=== phase 3 (preempt runner, attempt $attempt, $(date)) ==="
  if run_tpu python scripts/r4_phase3.py \
      --stages stretch_drift,segno_latency,bf16_quality,mocap; then
    echo "=== phase 3 done ($(date)) ==="
    exit 0
  fi
  echo "phase 3 died (attempt $attempt); 680 s hold, then probe"
  sleep 680
  probe || exit 1
done
echo "phase 3 exhausted restart attempts"; exit 1
