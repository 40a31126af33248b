#!/bin/bash
# Round-3 session resume: regenerate the reference-protocol ledgers that the
# previous session produced but never committed (results/ is gitignored and
# the machine was reset between sessions — RESULTS.md's «ref» table survived,
# its backing ledgers did not). Phases are chip-serialized (one TPU client at
# a time on the tunneled chip) and resume-safe via the sweep JSONL ledgers:
#   1. generate any missing canonical datasets (seed 43, BASELINE.md constants)
#   2. PRO_HEADLINE at reference protocol (the 4 groups blocked by the
#      round-3 chip outage; scripts/ref_protocol_schedule.yaml)
#   3. full BASE grid at reference protocol (epochs<=1000, patience-15,
#      /root/reference/main.py:37-45) — grid order puts the cheap SEGNO
#      groups first and the ~2.5h-per-group EGNO N=20 fleets last.
set -e
cd "$(dirname "$0")/.."

gen () {  # sim n_balls
  if [ ! -f "data/loc_train_${1}${2}_initvel1small.npy" ]; then
    echo "=== datagen $1 n=$2 ==="
    python -m nonode_tpu.sim.generate --simulation "$1" --n_balls "$2" \
      --num-train 3000 --num-valid 2000 --num-test 2000 \
      --length 20000 --length_test 52000 --sample-freq 100 \
      --seed 43 --suffix small --outdir data
  fi
}

gen charged 5
gen gravity 5

echo "=== PRO_HEADLINE @ reference protocol ==="
python -m nonode_tpu.parallel.sweep --grid PRO_HEADLINE \
  --schedule scripts/ref_protocol_schedule.yaml \
  --data_dir data --outf results/pro_ref --epochs 1000 --batch_size 256

for n in 10 20; do
  gen charged $n
  gen gravity $n
done

echo "=== BASE grid @ reference protocol (gravity/egno/20 first) ==="
python -m nonode_tpu.parallel.sweep --grid BASE --use_fleet \
  --schedule scripts/base_ref_schedule_r3.yaml \
  --data_dir data --outf results/base_ref --epochs 1000 --batch_size 256

echo "=== done ==="
