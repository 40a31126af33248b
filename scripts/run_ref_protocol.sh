#!/bin/bash
# Re-run the BASE grid + the 4 headline PRO groups at REFERENCE protocol:
# epochs <= 1000 with patience-15 early stopping, matching
# /root/reference/main.py:37-45 (the round-2 grids truncated at 300 epochs;
# EGNO's canonical runs need ~900 epochs to converge). Separate outf
# (results/base_ref, results/pro_ref) keeps the 300-epoch ledgers intact
# for the protocol («300ep» vs «ref») comparison in RESULTS.md.
# Resumable via the sweep ledgers.
set -e
cd "$(dirname "$0")/.."

gen () {  # sim n_balls
  if [ ! -f "data/loc_train_${1}${2}_initvel1small.npy" ]; then
    python -m nonode_tpu.sim.generate --simulation "$1" --n_balls "$2" \
      --num-train 3000 --num-valid 2000 --num-test 2000 \
      --length 20000 --length_test 52000 --sample-freq 100 \
      --seed 43 --suffix small --outdir data
  fi
}

for n in 5 10 20; do
  gen charged $n
  gen gravity $n
done

python -m nonode_tpu.parallel.sweep --grid BASE --use_fleet \
  --data_dir data --outf results/base_ref --epochs 1000 --batch_size 256

python -m nonode_tpu.parallel.sweep --grid PRO_HEADLINE \
  --schedule scripts/ref_protocol_schedule.yaml \
  --data_dir data --outf results/pro_ref --epochs 1000 --batch_size 256
