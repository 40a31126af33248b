#!/bin/bash
# Full reference PRO grid (multi-input x varDT x 3 seeds, both models,
# charged+gravity, n_balls 5 then 10) on the canonical datasets.
# Resumable: sweep ledgers + existing dataset files are skipped.
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

gen charged 5
gen gravity 5
gen charged 10
gen gravity 10

python -m nonode_tpu.parallel.sweep --schedule scripts/pro_schedule.yaml \
  --grid PRO5 --data_dir data --outf results/pro \
  --epochs 300 --batch_size 256
python -m nonode_tpu.parallel.sweep --schedule scripts/pro_schedule.yaml \
  --grid PRO10 --data_dir data --outf results/pro \
  --epochs 300 --batch_size 256
