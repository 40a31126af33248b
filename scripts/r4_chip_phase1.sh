#!/bin/bash
# Round-4 chip phase 1 (serialized TPU work; one client at a time on the
# tunneled chip — see .claude/skills/verify/SKILL.md wedge runbook):
#   0. probe the chip (first post-hold contact must be the tiny probe)
#   1. regenerate charged-20 (machine reset wiped all but charged-5;
#      datagen is bit-deterministic at seed 43 — round-3 evidence)
#   2. BASE grid at reference protocol, resume: the only pending group is
#      egno/charged/20 seeds 1-5 (VERDICT round-3 item 2 — back the
#      published 0.0113 +- 0.0045 row with a committed ledger). The fleet
#      checkpoints mid-run (--checkpoint_every) so a wedge kill costs at
#      most ~50 epochs.
#   3. regenerate the remaining canonical datasets for phase 2 (PRO grid)
# Every python invocation runs under run_tpu (PID registered for the stall
# killer, r4_stall_killer.sh).
set -e
cd "$(dirname "$0")/.."
source scripts/r4_tpu_lib.sh

probe

gen () {  # sim n_balls
  if [ ! -f "data/loc_train_${1}${2}_initvel1small.npy" ]; then
    echo "=== datagen $1 n=$2 ==="
    run_tpu python -m nonode_tpu.sim.generate --simulation "$1" --n_balls "$2" \
      --num-train 3000 --num-valid 2000 --num-test 2000 \
      --length 20000 --length_test 52000 --sample-freq 100 \
      --seed 43 --suffix small --outdir data
  fi
}

# ALL datagen first (each ~1-4 min, bit-deterministic at seed 43): a wedge
# or cutoff inside the multi-hour charged-20 fleet must never leave phase 2
# (the PRO grid) blocked on missing datasets.
gen charged 20
gen charged 10
gen gravity 5
gen gravity 10
gen gravity 20

echo "=== BASE @ reference protocol: resume (pending: egno/charged/20) ==="
run_tpu python -m nonode_tpu.parallel.sweep --grid BASE --use_fleet \
  --schedule scripts/base_ref_schedule_r3b.yaml \
  --data_dir data --outf results/base_ref --epochs 1000 --batch_size 256

echo "=== phase 1 done ==="
